package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics — the tokenizer-training prep step of a
  * pretraining pipeline (builder mandate): the term-frequency table a
  * BPE/unigram trainer seeds from, and the top-k coverage curve ("the
  * 25 most frequent tokens cover X% of all occurrences") that sizes a
  * vocabulary. Corpus-level, unlike the per-document tf-idf of
  * `queries/TextQueries.q66`.
  *
  * Scale shapes: [[tokenCounts]] is one token explode into a count
  * aggregate with map-side combine — the only shuffle is token-keyed
  * partial counts. [[topVocab]] takes the global top-k via
  * `orderBy(...).limit(k)`, which Spark plans as TakeOrderedAndProject
  * (per-partition bounded heaps merged on the driver, k rows — never a
  * global sort); only the k surviving rows pass through the
  * rank/cumulative window, so the single-partition window frame is
  * k-bounded by construction.
  */
object Vocab {

  /** (token, cnt) over whitespace tokens of `textCol`. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    graft.core.Widen.widen(df)
      .select(explode(TextFunctions.wsTokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))

  /** Vocabulary growth curve (Heaps' law diagnostics) at id-ordered
    * corpus checkpoints: for each checkpoint id `c`, the cumulative
    * token occurrences and DISTINCT vocabulary size over documents
    * with id ≤ c, plus the type-token ratio. Sub-linear vocabulary
    * growth (V ∝ N^β, β<1) is the healthy-corpus signature; a curve
    * bending back toward linear means unbounded novel symbols (OCR
    * noise, boilerplate ids) that will bloat a tokenizer trained on it.
    *
    * Scale shape: ZERO joins. Each token's contribution to every
    * checkpoint is decided by its FIRST-occurrence id (one explode +
    * min groupBy), bucketed to the smallest covering checkpoint by a
    * literal when-chain, counted per bucket (a |checkpoints|-row
    * frame), and closed under a cumulative window over that bounded
    * frame. Occurrence totals take the same path from per-doc counts.
    * Checkpoints must be ascending; documents past the last checkpoint
    * don't contribute. */
  def growthCurve(df: DataFrame, idCol: String, textCol: String,
                  checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints == checkpoints.sorted &&
      checkpoints.distinct == checkpoints, "checkpoints must be ascending and distinct")
    // smallest checkpoint covering an id; null past the last one
    def bucketOf(id: org.apache.spark.sql.Column) =
      checkpoints.foldRight(lit(null).cast("long")) { (c, acc) =>
        when(id <= c, lit(c)).otherwise(acc)
      }
    val firstSeen = graft.core.Widen.widen(df)
      .select(col(idCol).as("__id"),
        explode(TextFunctions.wsTokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(min(col("__id")).as("__first"))
      .select(bucketOf(col("__first")).as("checkpoint"))
      .filter(col("checkpoint").isNotNull)
      .groupBy(col("checkpoint"))
      .agg(count(lit(1)).as("__new_types"))
    val occ = df
      .select(bucketOf(col(idCol)).as("checkpoint"),
        size(TextFunctions.wsTokens(col(textCol))).cast("long").as("__n"))
      .filter(col("checkpoint").isNotNull)
      .groupBy(col("checkpoint"))
      .agg(sum(col("__n")).as("__new_occ"))
    val spine = df.sparkSession.createDataFrame(
      checkpoints.map(Tuple1(_))).toDF("checkpoint")
    val w = Window.orderBy(col("checkpoint"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine // bounded frame: |checkpoints| rows — the window is cheap
      .join(firstSeen, Seq("checkpoint"), "left")
      .join(occ, Seq("checkpoint"), "left")
      .withColumn("n_tokens", sum(coalesce(col("__new_occ"), lit(0L))).over(w))
      .withColumn("vocab", sum(coalesce(col("__new_types"), lit(0L))).over(w))
      .withColumn("type_token_ratio",
        when(col("n_tokens") > 0,
          col("vocab").cast("double") / col("n_tokens").cast("double")))
      .select(col("checkpoint"), col("n_tokens"), col("vocab"),
        col("type_token_ratio"))
  }

  /** Top-k vocabulary by count (ties broken by token, total order):
    * (token, cnt, rank, cum_share) where `cum_share` is the fraction of
    * ALL token occurrences covered by ranks 1..r — exact integer
    * cumulative count over the k rows divided by the exact corpus
    * total, one deterministic IEEE division per row. */
  def topVocab(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = tokenCounts(df, textCol)
    val total = counts.agg(sum(col("cnt")).as("__total"))
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_share",
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("__total").cast("double"))
      .drop("__total")
  }

  /** Vocabulary-coverage estimation per group — "how much of the
    * language have we NOT seen yet": the Good–Turing unseen-probability
    * mass P₀ = f₁/N (Good 1953 — the probability the next token is a
    * new type) and the bias-corrected Chao1 richness estimate
    * V + f₁(f₁−1)/(2(f₂+1)) (Chao 1984/1987) from the
    * frequency-of-frequencies f₁ (singletons) and f₂ (doubletons).
    * The corpus-growth planning numbers a pretraining pipeline reads
    * before deciding whether more of a language is worth crawling.
    *
    * Two map-side-combined aggregations (token counts, then a count
    * census per group); integer until one IEEE division per estimate.
    *
    * @return groupCols ++ (n_tokens, vocab, f1, f2, p_unseen, chao1) */
  def coverageEstimate(df: DataFrame, groupCols: Seq[String],
                       textCol: String): DataFrame = {
    val g = groupCols.map(col)
    val counts = df
      .select(g :+ explode(split(trim(col(textCol)), "\\s+")).as("__tok"): _*)
      .filter(col("__tok") =!= "")
      .groupBy(g :+ col("__tok"): _*)
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(g: _*)
      .agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("__c") === 1, lit(1L)).otherwise(lit(0L))).as("f1"),
        sum(when(col("__c") === 2, lit(1L)).otherwise(lit(0L))).as("f2"))
      .withColumn("p_unseen", col("f1").cast("double") / col("n_tokens"))
      .withColumn("chao1", col("vocab") +
        (col("f1") * (col("f1") - 1)).cast("double") / (lit(2.0) * (col("f2") + 1)))
  }
}
