package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al.) — the standard way to merge
  * rankings from heterogeneous retrieval systems (lexical BM25,
  * embedding ANN, quality priors) without calibrating their scores
  * against each other: each system contributes `1 / (c + rank)` and
  * documents sort by the sum. Only RANKS cross the system boundary, so
  * systems with incomparable score scales fuse cleanly.
  *
  * Determinism: contributions are e9-floored integers
  * (`floor(1e9 / (c + rank) + 0.5)` — one IEEE division per row), so
  * the fused score is an int64 sum, order-independent and
  * oracle-replayable (the engine's standard integer-ranking
  * discipline).
  *
  * Scale shape: one unionByName of the (already k-bounded) per-system
  * rankings, one (query, doc) groupBy, one per-query top-k window over
  * ≤ systems·k rows per query. Work tracks the candidate lists, never
  * the corpus.
  */
object Fusion {

  /** Fuse ranked frames (each `(qidCol, idCol, rank)`, rank 1-based;
    * extra columns ignored) into per-query top-`k` by RRF. Output:
    * `(qidCol, rank, idCol, rrf_e9, n_systems)` where `n_systems`
    * counts how many input rankings surfaced the document. */
  def rrf(ranked: Seq[DataFrame], qidCol: String, idCol: String,
          c: Long = 60L, k: Int = 10): DataFrame = {
    require(ranked.nonEmpty, "need at least one ranking")
    require(c >= 1 && k >= 1, s"need c >= 1 and k >= 1, got c=$c k=$k")
    val contribs = ranked.map(_.select(col(qidCol), col(idCol),
      floor(lit(1e9) / (lit(c) + col("rank")).cast("double") + lit(0.5))
        .cast("long").as("__c")))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("rrf_e9").desc, col(idCol).asc)
    contribs.reduce(_.unionByName(_))
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__c")).as("rrf_e9"),
        count(lit(1)).cast("long").as("n_systems"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("rrf_e9"),
        col("n_systems"))
  }
}
