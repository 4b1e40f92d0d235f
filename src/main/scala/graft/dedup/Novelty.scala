package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-order novelty scoring (builder mandate: training-data
  * curation): how much of each document is NEW relative to everything
  * that came before it in corpus order?
  *
  * For each document, over its distinct k-shingles: `n_novel` counts
  * the shingles whose FIRST corpus occurrence (minimum id over the
  * whole corpus) is this document, and `novelty = n_novel /
  * n_shingles`. An exact duplicate of an earlier document scores 0; a
  * document of fresh prose scores ~1; boilerplate-heavy pages land in
  * between. Unlike pairwise near-dup detection this is a per-document
  * SIGNAL (a curation feature alongside quality and language scores),
  * not a keep/drop decision — e.g. "drop everything below 0.3 novelty"
  * removes templated chaff that no single near-duplicate pair
  * explains, the dedup-aware counterpart of a quality score.
  *
  * Scale shape: one pass over the shingle inverted index. The
  * first-occurrence id is a `min` window over the `shingle`
  * partitioning — the same exchange the index's document-frequency
  * cutoff and posting joins use, NOT a groupBy + join back (which
  * would re-derive the tokenize+shingle subtree and pay a second
  * shuffle of it). Then one groupBy on the document id. Work is
  * postings-bounded (Σ distinct shingles per doc); nothing is
  * all-pairs, no driver-side state. At 100 TB both shuffles hash-
  * partition on high-cardinality keys and AQE handles stop-shingle
  * skew (or pre-cut with `maxDocFreq` in [[Dedup.shingleIndex]]).
  *
  * "First" is by minimum id, so scores are reproducible at any
  * parallelism for any id type with a total order; with ingest-ordered
  * ids (the common case) it is exactly "seen earlier in the corpus".
  */
object Novelty {

  /** Per-document novelty over distinct k-shingles: `(id, n_shingles,
    * n_novel, novelty)`. Documents shorter than k tokens have no
    * shingles and are ABSENT from the result (callers left-join and
    * decide their fate; a shingle-less doc has no evidence either
    * way). `maxDocFreq` forwards to [[Dedup.shingleIndex]] — note that
    * cutting stop-shingles changes the denominator, not just the
    * candidates, so score distributions shift; 0 keeps all. */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String, k: Int,
                    maxDocFreq: Long = 0L): DataFrame = {
    val idx = Dedup.shingleIndex(df, idCol, textCol, k, maxDocFreq)
    val byShingle = Window.partitionBy(col("shingle"))
    idx
      .withColumn("__first", min(col("doc")).over(byShingle))
      .groupBy(col("doc").as(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_shingles"),
        sum(when(col("doc") === col("__first"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_shingles").cast("double"))
  }

  /** Incremental novelty — the batch-over-landed-index form an
    * ingest pipeline actually runs (same shape as
    * [[Dedup.incrementalNearDups]]): score ONLY the new batch, where a
    * shingle is novel iff it is absent from the LANDED corpus index
    * (first occurrences WITHIN the batch count as novel — the landed
    * corpus is the reference, not the batch's own order). Work tracks
    * the batch: the batch's shingles anti-probe the landed index on
    * the shingle key; the landed mass is never rescanned per document.
    * `landedIdx` is a (doc, shingle) frame from [[Dedup.shingleIndex]]
    * (persisted between runs at scale). */
  def incrementalNovelty(batch: DataFrame, landedIdx: DataFrame,
                         idCol: String, textCol: String, k: Int): DataFrame = {
    val bsh = Dedup.shingleIndex(batch, idCol, textCol, k)
    val landed = landedIdx.select(col("shingle")).distinct()
    val novel = bsh.join(landed, Seq("shingle"), "left_anti")
      .groupBy(col("doc")).agg(count(lit(1)).cast("long").as("n_novel"))
    bsh.groupBy(col("doc")).agg(count(lit(1)).cast("long").as("n_shingles"))
      .join(novel, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_shingles").cast("double"))
  }

  /** [[noveltyScores]] folded to a per-group census — the corpus-level
    * report: per `groupCol` (e.g. source or language), document count,
    * mean novelty, and the count below `threshold` (the would-be-
    * dropped chaff). Shingle-less documents are excluded (consistent
    * with [[noveltyScores]]). */
  def noveltyCensus(df: DataFrame, idCol: String, textCol: String, k: Int,
                    groupCol: Column, threshold: Double): DataFrame = {
    val scored = noveltyScores(df, idCol, textCol, k)
    df.select(col(idCol), groupCol.as("group"))
      .join(scored, Seq(idCol))
      .groupBy(col("group"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        avg(col("novelty")).as("mean_novelty"),
        sum(when(col("novelty") < threshold, 1L).otherwise(0L))
          .as("n_below"))
  }
}
