package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Margin-based mutual-nearest-neighbor bitext mining (builder
  * mandate: how parallel corpora for translation training are mined
  * from two monolingual embedding sides — Artetxe & Schwenk 2019, the
  * CCMatrix/LASER recipe).
  *
  * A pair (x, y) is kept when each is the other's top-1 cosine
  * neighbor (mutuality kills hub vectors that are "near everything"),
  * scored by the MARGIN: the pair's cosine relative to the mean of
  * each side's k-nearest cosines,
  * `margin = cos(x,y) / ((meanK(x) + meanK(y)) / 2)` — a margin ≈ 1
  * means y is no closer to x than x's general neighborhood (reject); a
  * high margin means the pair stands out of both neighborhoods (the
  * actual-translation signal).
  *
  * Determinism: all margin arithmetic runs on e9-floored integer
  * cosines — `margin = 2·c·kx·ky / (sx·ky + sy·kx)` is a ratio of
  * exact int64 products with ONE final double division, so mining is
  * engine-reproducible (a double mean of doubles would be
  * addition-order-dependent at the ulp).
  *
  * Scale shape: [[marginScores]] is source-agnostic — it consumes the
  * (qid, rank, nid, cos_e9) frames of ANY top-k provider, so the 100 TB
  * path feeds it [[Knn.lshTopK]] (bucket-local candidates) while specs
  * and oracles feed it [[Knn.bruteForceTopK]] (the exact baseline,
  * broadcast-scan shape). Everything downstream of the neighbor frames
  * is per-qid aggregates and id-keyed joins — no all-pairs anywhere.
  */
object Bitext {

  /** Mutual-top-1 pairs with integer-exact margins from two neighbor
    * frames (x→y and y→x, columns `qid, rank, nid, cos_e9`; ranks
    * 1..k, rank 1 = nearest). Output: `(xid, yid, cos_e9, margin)`,
    * one row per mutual pair with margin ≥ `minMargin`. */
  def marginScores(nnXY: DataFrame, nnYX: DataFrame,
                   minMargin: Double): DataFrame = {
    // ONE aggregation per side extracts both the neighborhood stats and
    // the top-1 edge (rank 1 exists exactly once per qid). A stats
    // aggregate plus a separate rank-1 filter would consume each
    // neighbor frame twice — and a neighbor frame is the OUTPUT of an
    // expensive top-k subtree, which Spark would then evaluate twice
    // per side (measured 2x the whole q131 runtime).
    val xa = nnXY.groupBy(col("qid").as("xid"))
      .agg(sum(col("cos_e9")).as("sx"), count(lit(1)).as("kx"),
        max(when(col("rank") === 1, col("nid"))).as("yid"),
        max(when(col("rank") === 1, col("cos_e9"))).as("cos_e9"))
    val ya = nnYX.groupBy(col("qid").as("yid"))
      .agg(sum(col("cos_e9")).as("sy"), count(lit(1)).as("ky"),
        max(when(col("rank") === 1, col("nid"))).as("__xback"))
    xa.join(ya, Seq("yid"))
      .filter(col("xid") === col("__xback")) // mutuality
      .withColumn("margin",
        (lit(2L) * col("cos_e9") * col("kx") * col("ky")).cast("double") /
          (col("sx") * col("ky") + col("sy") * col("kx")).cast("double"))
      .filter(col("margin") >= minMargin)
      .select(col("xid"), col("yid"), col("cos_e9"), col("margin"))
  }

  /** Any `(qid, rank, nid, cos)` top-k output ([[Knn.bruteForceTopK]]
    * or [[Knn.lshTopK]]) re-keyed to the e9-floored integer cosine
    * frame [[marginScores]] consumes. */
  def toNeighborFrame(topK: DataFrame): DataFrame =
    topK.select(col("qid"), col("rank"),
      col("nid"), floor(col("cos") * lit(1e9) + lit(0.5)).cast("long").as("cos_e9"))

  /** [[Knn.bruteForceTopK]] wired through [[toNeighborFrame]]. */
  def neighborFrame(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame =
    toNeighborFrame(Knn.bruteForceTopK(corpus, queries, idCol, vecCol, k))

  /** Exact-baseline mining: brute-force k-NN both directions →
    * [[marginScores]]. The broadcast side is the QUERY side each time,
    * so this wiring fits when either side broadcasts; swap in
    * [[Knn.lshTopK]]-derived frames beyond that. */
  def minePairs(x: DataFrame, y: DataFrame, idCol: String, vecCol: String,
                k: Int, minMargin: Double): DataFrame =
    marginScores(
      neighborFrame(corpus = y, queries = x, idCol, vecCol, k),
      neighborFrame(corpus = x, queries = y, idCol, vecCol, k),
      minMargin)
}
