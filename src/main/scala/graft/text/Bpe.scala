package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer TRAINING over a corpus (builder
  * mandate: tokenizer learning is the step between corpus curation and
  * packing in every pretraining pipeline; Sennrich et al. 2016).
  *
  * The scale split mirrors how production tokenizer trainers actually
  * run: the CORPUS-SCALE work is reducing 100 TB of text to a
  * word-frequency table (one explode + count shuffle with map-side
  * combine — [[Vocab.tokenCounts]]), optionally capped to the top-V
  * words by TakeOrderedAndProject (bounded heaps, no global sort). The
  * merge LOOP then runs over that BOUNDED table (V rows, not corpus
  * rows) on the driver — merge r+1's counts depend on merge r's
  * rewrite, an inherently sequential dependency, and doing V-bounded
  * work per merge beats a Spark job per merge by orders of magnitude
  * (HF/SentencePiece train exactly this way: distributed count,
  * local merge loop).
  *
  * Conventions (documented, deterministic, engine-free):
  *  - symbols start as single characters (no end-of-word marker);
  *  - a pair's frequency counts every adjacent position in every word
  *    occurrence (overlaps included: "aaa" holds (a,a) twice);
  *  - the winning pair is max by (freq, then lexicographically
  *    smallest left, then right) — a total order, so training is
  *    reproducible anywhere;
  *  - merges apply left-to-right, non-overlapping.
  */
object Bpe {

  /** One learned merge: rank (1-based), the two symbols joined, and
    * the pair frequency at the time of the merge. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Declarative BPE ENCODER — applying a trained merge table to the
    * corpus (tokenizer INFERENCE, the production counterpart of the
    * training above): each `[a-z]+` word is wrapped into
    * boundary-delimited symbols (`the` → `|t||h||e|`) and each merge
    * (a, b) → ab becomes ONE literal string replace
    * `|a||b|` → `|ab|`, chained in rank order. Everything is built-in
    * codegen'd string expressions — no UDF, no per-word loop (upgrade
    * over [[encodeStats]]'s broadcast-UDF spelling) — and the identical
    * replace chain runs verbatim in any SQL engine, so the whole
    * encode sits under a hash-gated oracle (q262).
    *
    * Semantics note: a single global replace pass per merge equals
    * priority-ordered BPE iff no merge consumes a symbol PRODUCED by a
    * LATER merge (single-character pair sides can never be regenerated,
    * and multi-character sides must be produced by an earlier rank).
    * [[requireChainable]] enforces exactly that precondition, so the
    * declarative spelling is exact, not an approximation. String
    * `replace` scans left-to-right and continues AFTER each
    * replacement in both Spark and DuckDB — the standard BPE
    * non-overlapping left-to-right application. */
  def applyMergesCol(text: Column, merges: Seq[(String, String)]): Column = {
    requireChainable(merges)
    val toks = call_function("regexp_extract_all", text, lit("[a-z]+"), lit(0))
    val wrapped = array_join(
      transform(toks, w => regexp_replace(w, "(.)", "|$1|")), " ")
    merges.foldLeft(wrapped) { case (s, (a, b)) =>
      call_function("replace", s, lit(s"|$a||$b|"), lit(s"|$a$b|"))
    }
  }

  /** Precondition for the chained-replace encoder (see
    * [[applyMergesCol]]): every multi-character merge side must be the
    * product of an EARLIER merge. */
  def requireChainable(merges: Seq[(String, String)]): Unit = {
    val produced = mutable.Set.empty[String]
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      Seq(a, b).foreach { side =>
        require(side.length == 1 || produced.contains(side),
          s"merge ${i + 1} ($a, $b): side '$side' is not a single char and " +
            "not produced by an earlier merge — chained replace would diverge from BPE")
      }
      produced += (a + b)
    }
  }

  /** Adjacent-pair census over a word-frequency table — the merge
    * loop's iteration-0 statistics, kept DISTRIBUTED (this is the
    * corpus-scale part, and the q130 oracle surface): explode each
    * word's adjacent character pairs weighted by the word's count.
    * Input: (token, cnt); output: (pair, freq). */
  def pairCensus(wordFreq: DataFrame): DataFrame = {
    val tok = col("token")
    val pairs = when(length(tok) >= 2,
      transform(sequence(lit(1), length(tok) - 1), i =>
        concat_ws(" ", tok.substr(i, lit(1)), tok.substr(i + 1, lit(1)))))
      .otherwise(array().cast("array<string>"))
    wordFreq
      .select(explode(pairs).as("pair"), col("cnt"))
      .groupBy(col("pair"))
      .agg(sum(col("cnt")).as("freq"))
  }

  /** The merge loop over a BOUNDED word-frequency table. Stops early
    * when no pair remains (every word fully merged). O(V · maxLen) per
    * merge — recounted from the rewritten words, which for the bounded
    * V this is designed for is faster than incremental bookkeeping is
    * complicated. */
  def trainMerges(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    var words: Array[(Array[String], Long)] =
      wordFreq.iterator.filter(_._1.nonEmpty)
        .map { case (w, f) => (w.map(_.toString).toArray, f) }.toArray
    val merges = mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, rt), f) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += Merge(r, l, rt, f)
        val joined = l + rt
        words = words.map { case (syms, wf) =>
          if (syms.length < 2) (syms, wf)
          else {
            val out = mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rt) {
                out += joined; i += 2 // left-to-right, non-overlapping
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, wf)
          }
        }
        r += 1
      }
    }
    merges.toSeq
  }

  /** End-to-end learning: distributed word census → top-V cap
    * (TakeOrderedAndProject; ties broken by token so the cap is a
    * total order) → bounded collect → driver merge loop. The ONLY
    * collect is the V-row vocabulary — corpus size never reaches the
    * driver. */
  def learn(df: DataFrame, textCol: String, topV: Int, nMerges: Int): Seq[Merge] = {
    require(topV > 0, s"topV must be positive, got $topV")
    val wf = Vocab.tokenCounts(df, textCol)
      .orderBy(col("cnt").desc, col("token"))
      .limit(topV)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    trainMerges(wf, nMerges)
  }

  /** Learned merges as a DataFrame (rank, left, right, freq) — the
    * artifact a pipeline persists and later runs [[encodeStats]]
    * against. */
  def mergesTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "left", "right", "freq")
  }

  /** Apply learned merges: per document, the BPE token count after
    * greedy lowest-rank-first merging of each whitespace word (the
    * standard tokenizer apply loop). The merge table broadcasts as a
    * rank map inside a UDF — dictionary-driven control flow no Catalyst
    * expression expresses; the per-row cost is the tokenizer itself,
    * not plan overhead. Output: input columns + `n_words`,
    * `n_bpe_tokens`. A document's token count is partition-independent
    * (pure function of its text), so the column is deterministic. */
  def encodeStats(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = df.sparkSession.sparkContext.broadcast(ranks)
    val countTokens = udf { (text: String) =>
      if (text == null) (0L, 0L)
      else {
        val words = text.trim.split("\\s+").filter(_.nonEmpty)
        var total = 0L
        words.foreach { w =>
          var syms: Array[String] = w.map(_.toString).toArray
          var merged = true
          while (merged && syms.length >= 2) {
            val rk = bc.value
            var bestRank = Int.MaxValue
            var i = 0
            while (i < syms.length - 1) {
              val r = rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
              if (r < bestRank) bestRank = r
              i += 1
            }
            if (bestRank == Int.MaxValue) merged = false
            else {
              val out = mutable.ArrayBuffer.empty[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 &&
                  rk.getOrElse((syms(j), syms(j + 1)), Int.MaxValue) == bestRank) {
                  out += (syms(j) + syms(j + 1)); j += 2
                } else { out += syms(j); j += 1 }
              }
              syms = out.toArray
            }
          }
          total += syms.length
        }
        (words.length.toLong, total)
      }
    }
    df.withColumn("__enc", countTokens(col(textCol)))
      .withColumn("n_words", col("__enc._1"))
      .withColumn("n_bpe_tokens", col("__enc._2"))
      .drop("__enc")
  }

  /** Tokenizer fertility census — the standard tokenizer-quality
    * report: per group (usually language), total words/tokens/chars
    * and the derived `fertility` (BPE tokens per word; 1.0 = every
    * word is one token) and `chars_per_token` (compression). A
    * tokenizer trained on English prose shows fertility near 1 on its
    * training language and blowing up on scripts it never merged —
    * this census is how that imbalance is caught before a training
    * run burns budget on it. One [[encodeStats]] pass + one
    * aggregation. */
  def fertilityCensus(df: DataFrame, textCol: String, groupCol: Column,
                      merges: Seq[Merge]): DataFrame =
    encodeStats(df, textCol, merges)
      .groupBy(groupCol.as("group"))
      .agg(
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
        sum(length(col(textCol))).cast("long").as("n_chars"))
      .withColumn("fertility",
        col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
}
