package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * linear-algebra primitive behind whitening, anisotropy diagnostics
  * ("is the embedding space collapsing onto one direction?") and the
  * all-but-the-top post-processing step common in embedding pipelines.
  *
  * Shaped for the 100 TB regime the way distributed PCA always is:
  * the ONLY full pass over the data computes the d×d second-moment
  * matrix Σᵣ x xᵀ — d(d+1)/2 partial sums that combine map-side, so
  * the shuffle carries one short row per partition regardless of row
  * count — and the eigensolve runs driver-side on the collected d×d
  * matrix (d ≤ a few hundred; the collect is dim-bounded, never
  * row-bounded). Projection back onto the data is a per-row dot with a
  * literal vector: no shuffle, full codegen.
  *
  * Numerics follow the engine's reproducibility convention: elements
  * are scaled to integers (`floor(x·1e6 + 0.5)`, one decade coarser
  * than [[Knn.scaledVec]] so a pairwise product stays ~1e12 per unit²
  * and int64 holds corpus-scale sums), moment sums are exact
  * associative int64 adds (order-independent across any partitioning),
  * and the power iteration runs on the exact integer matrix in driver
  * doubles with a fixed start and iteration count — bit-identical on
  * every run and engine.
  */
object Pca {

  /** 1e6 element scale: moment entries are Σ s_i·s_j with
    * |s| ≤ 4·1e6 for |x| ≤ 4, so int64 (< 9.2e18) holds ~5e5 rows per
    * unit⁴ of element magnitude; beyond that route the sum through
    * DECIMAL — at that scale the d(d+1)/2-column aggregate is still
    * one map-combined pass. */
  val Scale = 1e6

  def scaled(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(Scale) + lit(0.5)).cast("long"))

  /** Upper-triangle (i ≤ j, 0-based) of the scaled second-moment
    * matrix as rows (i, j, g): g = Σ_rows s_i · s_j, exact int64.
    * One scan; each row emits its d(d+1)/2 pair products through a
    * single `transform` over a literal pair-index array (one codegen'd
    * expression, not d² columns), and the hash aggregate combines them
    * map-side into d(d+1)/2 groups — the shuffle carries ≤ 2080 rows
    * per partition whatever the row count. */
  def secondMoment(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    // one TypedImperativeAggregate pass: a flat long[d(d+1)/2] buffer
    // updated with a multiply-add loop per row, merged element-wise —
    // no per-pair row explosion (graft.functions.MomentSum)
    graft.functions.MomentSum.register(emb.sparkSession)
    val pairCodes = array((for { i <- 0 until dim; j <- i until dim }
      yield lit(i.toLong * dim + j)): _*)
    emb.select(scaled(col(vecCol)).as("__s"))
      .agg(expr(s"moment_sum(__s, $dim)").as("__m"))
      .select(explode(zip_with(pairCodes, col("__m"),
        (k, g) => struct(k.as("k"), g.as("g")))).as("e"))
      .select((col("e.k") / dim).cast("int").as("i"),
        (col("e.k") % dim).cast("int").as("j"), col("e.g").as("g"))
  }

  /** Per-row upper-triangle pair products as (k, p) rows with
    * k = i·dim + j flat-encoded — the pre-aggregation form shared by
    * the batch moment, the incremental update, and a streaming
    * maintenance sink (`groupBy(k).sum(p)` under any engine mode). */
  def pairProducts(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    // pair k ↔ (i, j) with i ≤ j, flat-encoded as i·dim + j so the
    // literal is a plain int64 array
    val pairCodes = for { i <- 0 until dim; j <- i until dim }
      yield lit(i.toLong * dim + j)
    val sv = scaled(col(vecCol))
    emb.select(sv.as("__s"))
      .select(explode(transform(array(pairCodes: _*), k =>
        struct(k.as("k"),
          (element_at(col("__s"), (k / dim).cast("int") + 1) *
            element_at(col("__s"), (k % dim).cast("int") + 1)).as("p")))).as("e"))
      .select(col("e.k").as("k"), col("e.p").as("p"))
  }

  /** Incremental moment maintenance — the 100 TB path when a batch
    * lands: G' = G + G(added) − G(removed). Exact int64 sums are a
    * commutative group, so the update is EXACTLY the full recompute
    * (gated so by the q176 oracle, which recomputes from scratch);
    * only the delta slices are scanned, the landed triangle is
    * d(d+1)/2 rows. */
  def updateMoment(old: DataFrame, added: DataFrame, removed: DataFrame,
                   vecCol: String, dim: Int): DataFrame = {
    val a = secondMoment(added, vecCol, dim)
      .withColumnRenamed("g", "__ga")
    val r = secondMoment(removed, vecCol, dim)
      .withColumnRenamed("g", "__gr")
    old.join(a, Seq("i", "j"), "full_outer")
      .join(r, Seq("i", "j"), "full_outer")
      .select(col("i"), col("j"),
        (coalesce(col("g"), lit(0L)) + coalesce(col("__ga"), lit(0L))
          - coalesce(col("__gr"), lit(0L))).as("g"))
  }

  /** Driver-side deterministic power iteration on the collected moment
    * matrix: fixed uniform start, `iters` matrix-vector products with
    * L2 renormalization, sign fixed so the largest-|coordinate| entry
    * is positive (ties to the lowest index). Returns (eigenvector,
    * eigenvalue) in the scaled units' geometry — the eigenvector is
    * scale-invariant, the eigenvalue is in Scale² units. */
  def topComponent(moment: DataFrame, dim: Int, iters: Int = 100): (Array[Double], Double) = {
    val g = Array.ofDim[Double](dim, dim)
    moment.select("i", "j", "g").collect().foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getLong(2).toDouble)
      g(i)(j) = v; g(j)(i) = v
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim)(i => {
        var s = 0.0; var j = 0
        while (j < dim) { s += g(i)(j) * v(j); j += 1 }
        s
      })
      val n = math.sqrt(w.map(x => x * x).sum)
      if (n == 0.0) return (v, 0.0) // zero matrix: any direction
      v = w.map(_ / n)
      lambda = n
      it += 1
    }
    // canonical sign: largest-|coordinate| entry positive, ties low index
    val k = v.indices.maxBy(i => (math.abs(v(i)), -i))
    if (v(k) < 0) v = v.map(-_)
    (v, lambda)
  }

  /** Per-row projection onto a literal direction (e.g. the top
    * component): adds `as` = Σ x_i·v_i over the RAW (unscaled) floats.
    * Pure per-row fold — no shuffle, whole-stage codegen. */
  def project(emb: DataFrame, vecCol: String, v: Array[Double], as: String): DataFrame = {
    val lits = array(v.map(lit): _*)
    emb.withColumn(as,
      aggregate(zip_with(col(vecCol).cast("array<double>"), lits, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x))
  }
}
