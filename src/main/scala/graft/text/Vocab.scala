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
}
