package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Johnson–Lindenstrauss random projection — the dimensionality cut an
  * embedding pipeline takes before ANN indexing when the stored
  * dimension, not the corpus, is the cost driver (d → p floats is a
  * d/p storage and bandwidth win; with ±1 signs the projection is
  * add/subtract only, no multiplies).
  *
  * The projection matrix is the md5-parity ±1 convention the LSH
  * hyperplanes already use ("jl:j:i" → first hex digit parity), baked
  * into the plan as p×d literals — nothing random at runtime, any
  * engine re-derives the identical matrix. Inputs are scaled-long
  * elements ([[Knn.scaledVec]]), so each projected coordinate
  * `y_j = Σ_i e_i · s_ji` is EXACT int64 (|y_j| ≤ d · max|e|), and
  * distance comparisons between projected vectors are integer-exact
  * until one final division.
  *
  * JL contract: E[‖Sx‖²] = p·‖x‖², so `‖Sx−Sy‖² / (p·‖x−y‖²)`
  * concentrates around 1 with relative error O(1/√p) — measured, not
  * assumed, by [[distortionCensus]] (and property-tested in
  * ProjectSpec; the q119 oracle replays matrix, projections and census
  * exactly).
  */
object Project {
  private val Dec0 = DecimalType(38, 0)

  /** ±1 sign for projected dim j, input dim i (md5 "jl:j:i" parity). */
  def sign(j: Int, i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"jl:$j:$i".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) % 2 == 1) 1L else -1L
  }

  /** Projected scaled-long vectors: (idCol, proj array<long> length p).
    * Per-row fold over literal sign arrays — no shuffle, full codegen. */
  def projectVectors(emb: DataFrame, idCol: String, vecCol: String,
                     p: Int, dim: Option[Int] = None): DataFrame = {
    val d = dim.getOrElse(Knn.inferDim(emb, vecCol))
    val ev = Knn.scaledVec(col(vecCol))
    def yj(j: Int): Column = {
      val signs = array((0 until d).map(i => lit(sign(j, i))): _*)
      aggregate(zip_with(ev, signs, (x, s) => x * s), lit(0L), (acc, x) => acc + x)
    }
    emb.select(col(idCol), array((0 until p).map(yj): _*).as("proj"))
  }

  /** Squared L2 distance of two scaled-long arrays as DECIMAL —
    * per-term squares can pass int64 for projected vectors. */
  private def dist2Dec(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y).cast(Dec0) * (x - y).cast(Dec0)),
      lit(0).cast(Dec0), (acc, x) => acc + x)

  /** Pairwise distortion census over all pairs of `emb` (cap the input
    * — the join is |emb|²/2 by design, a measurement tool, not a
    * production path): n_pairs and mean/min/max of
    * `‖Sx−Sy‖² / (p·‖x−y‖²)`, identical-vector pairs excluded. */
  def distortionCensus(emb: DataFrame, idCol: String, vecCol: String,
                       p: Int): DataFrame = {
    val proj = projectVectors(emb, idCol, vecCol, p)
    val full = emb.select(col(idCol), Knn.scaledVec(col(vecCol)).as("__ev"))
      .join(proj, idCol)
    val a = full.select(col(idCol).as("ia"), col("__ev").as("xa"), col("proj").as("pa"))
    val b = full.select(col(idCol).as("ib"), col("__ev").as("xb"), col("proj").as("pb"))
    // broadcast the (capped) right side: the pair enumeration becomes a
    // BroadcastNestedLoopJoin instead of a partitioned CartesianProduct
    a.join(org.apache.spark.sql.functions.broadcast(b), col("ia") < col("ib"))
      .withColumn("__o", dist2Dec(col("xa"), col("xb")).cast(DoubleType))
      .filter(col("__o") > 0) // identical vectors carry no distance to distort
      .withColumn("__r",
        dist2Dec(col("pa"), col("pb")).cast(DoubleType) / lit(p.toDouble) / col("__o"))
      .agg(
        count(lit(1)).as("n_pairs"),
        graft.core.Exact.lsumAt(col("__r"), 1e9).as("__sum_r"),
        min(col("__r")).as("min_ratio"),
        max(col("__r")).as("max_ratio"))
      .select(col("n_pairs"),
        (col("__sum_r") / col("n_pairs")).as("mean_ratio"),
        col("min_ratio"), col("max_ratio"))
  }
}
