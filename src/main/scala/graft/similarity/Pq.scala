package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) with asymmetric-distance (ADC) search —
  * the compressed-domain ANN path for corpora where even the vectors
  * don't fit: each vector is split into `m` subvectors, each subvector
  * quantized to one of `ksub` learned codes, so a d-float embedding
  * stores as m small ints (64 floats → 8 bytes at m=8) and search
  * scans CODES, never raw vectors, with per-query lookup tables.
  * Composes with [[Ivf]] at 100 TB (IVF prunes cells, PQ compresses
  * the residual scan); here the plain ADC linear scan is the gated
  * kernel.
  *
  * Everything is deterministic and integer-exact, so the full pipeline
  * — seeding, Lloyd refinement, encoding, ADC distances — replays
  * bit-for-bit in the SQL oracle: elements are scaled longs
  * ([[Knn.scaledVec]]), seed codebooks are the `ksub` corpus vectors
  * with the smallest md5(id) (the [[Ivf]] convention), centroid
  * updates round the exact int64 sum/count ratio half-up through a
  * double (both sums < 2⁵³, so the double is exact on any engine),
  * and every distance is an int64 sum of squared long differences —
  * no float accumulation anywhere, so aggregation order is free. */
object Pq {

  /** codebooks(j)(c)(t): subspace j ∈ [0,m), code c ∈ [0,ksub), local
    * dim t ∈ [0,dsub) — scaled-long centroids. */
  type Codebooks = Array[Array[Array[Long]]]

  /** Register the native encode + LUT + ADC + Lloyd expressions (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    PqEncode.register(spark)
    PqLut.register(spark)
    AdcDistance.register(spark)
    PqLloydPairs.register(spark)
  }

  /** A query row's m×ksub ADC lookup table as one native expression
    * ([[PqLut]]). The compositional spelling — m·ksub separate
    * [[subDist2]] folds — is both interpreted per element AND a
    * 256-term expression tree at m=ksub=16 that Catalyst has to
    * analyze and optimize per plan. */
  def lutCol(sv: Column, books: Codebooks): Column = {
    val flat = books.flatMap(_.flatMap(_.toSeq)).toSeq
    call_function("pq_lut", sv,
      typedlit(flat), lit(books.length), lit(books(0).length))
  }

  /** Σⱼ lut(j)(codes(j)) as one native int64 loop ([[AdcDistance]]) —
    * the per-pair ADC score. The compositional
    * `aggregate(zip_with(lut, codes, element_at))` form evaluates its
    * lambdas interpreted per element on the |corpus|×|queries| hot
    * path (the measured ~800× trap class, see [[PqEncode]]). */
  def adcCol(lut: Column, codes: Column): Column =
    call_function("adc_distance", lut, codes)

  private def scale(x: Float): Long =
    math.floor(x.toDouble * Knn.Scale + 0.5).toLong

  /** Squared L2 distance (scaled-long, exact) between subspace j of a
    * scaled vector column and a centroid literal — a per-row fold over
    * the slice, shuffle-free codegen. */
  private def subDist2(sv: Column, j: Int, dsub: Int, cent: Array[Long]): Column = {
    val lits = array(cent.map(lit): _*)
    aggregate(
      zip_with(slice(sv, j * dsub + 1, dsub), lits, (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, x) => acc + x)
  }

  /** `m` PQ codes per row as an array<int> column (argmin centroid per
    * subspace, ties to the lowest code). One native expression doing
    * plain array loops — a compositional form (m·ksub `aggregate`
    * folds over slices) evaluates its higher-order lambdas interpreted
    * per element and measured 250 s where this takes 0.3 s at sf0.1. */
  def encodeCol(sv: Column, books: Codebooks): Column = {
    val flat = books.flatMap(_.flatMap(_.toSeq)).toSeq // [m][ksub][dsub] row-major
    call_function("pq_encode", sv,
      typedlit(flat), lit(books.length), lit(books(0).length))
  }

  /** Train per-subspace codebooks: md5-ranked seeds + `iters` Lloyd
    * rounds. Each round is ONE pass (assign codes per row as column
    * expressions, then a grouped exact sum/count per (code, dim)); the
    * collect is ksub·dim rows — codebook-sized, never corpus-sized.
    * Cells that lose all members keep their previous centroid (the
    * q48 COALESCE convention). */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                     dim: Int, m: Int, ksub: Int, iters: Int): Codebooks = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    register(corpus.sparkSession)
    val dsub = dim / m
    val seeds = corpus
      .withColumn("__r", md5(col(idCol).cast("string")))
      .orderBy(col("__r"))
      .limit(ksub)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).map(scale).toArray)
    require(seeds.length == ksub,
      s"corpus has only ${seeds.length} rows; ksub=$ksub seed codebooks need at least ksub")
    seeds.find(_.length != dim).foreach(s => throw new IllegalArgumentException(
      s"seed vector has dim ${s.length}, expected $dim"))
    var books: Codebooks =
      Array.tabulate(m, ksub, dsub)((j, c, t) => seeds(c)(j * dsub + t))
    var it = 0
    while (it < iters) {
      val sv = Knn.scaledVec(col(vecCol))
      // (c, i, e) triples come from ONE native generator-input
      // expression: the encode-then-element_at spelling gets its
      // Project collapsed through the Generate, re-running the full
      // encode per exploded row (dim× redundant — see [[PqLloydPairs]])
      val flat = books.flatMap(_.flatMap(_.toSeq)).toSeq
      val upd = corpus
        .select(explode(call_function("pq_lloyd_pairs", sv,
          typedlit(flat), lit(m), lit(ksub))).as("__p"))
        .groupBy(col("__p.c").as("c"), col("__p.i").as("i"))
        .agg(sum(col("__p.e")).as("s"), count(col("__p.e")).as("n"))
        .collect()
      val next = books.map(_.map(_.clone()))
      upd.foreach { r =>
        val (c, i) = (r.getAs[Int]("c"), r.getAs[Int]("i"))
        val mInt = math.floor(
          r.getAs[Long]("s").toDouble / r.getAs[Long]("n") + 0.5).toLong
        next(i / dsub)(c)(i % dsub) = mInt
      }
      books = next
      it += 1
    }
    books
  }

  /** ADC top-k: corpus rows carry only their codes; each query
    * precomputes an m×ksub lookup table of subspace distances to every
    * centroid (a per-row expression over its own slice), and a pair's
    * distance is the int64 sum of m table lookups — the compressed-
    * domain linear scan. Ties (adc, nid asc). Queries drawn from the
    * corpus are excluded from their own result. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int, m: Int, ksub: Int,
              iters: Int = 1): DataFrame = {
    register(corpus.sparkSession)
    val books = trainCodebooks(corpus, idCol, vecCol, dim, m, ksub, iters)
    val enc = corpus.select(col(idCol).as("nid"),
      encodeCol(Knn.scaledVec(col(vecCol)), books).as("__codes"))
    val q = queries.select(col(idCol).as("qid"),
      lutCol(Knn.scaledVec(col(vecCol)), books).as("__lut"))
    val scored = enc.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("adc", adcCol(col("__lut"), col("__codes")))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("adc"))
  }

  /** IVF×PQ: the composed 100 TB shape — IVF cells prune the corpus
    * (probe `nProbe` of `nLists` Voronoi cells), PQ codes compress
    * what's left, ADC scores the survivors. The pair join is a plain
    * equi-join on the cell key (a corpus vector lives in exactly one
    * cell, so no dedup), which at scale becomes a partition-pruned
    * scan of cell-bucketed code files. Same determinism story as both
    * parents: double-fold IVF distances ([[Ivf]]'s convention) and
    * int64 ADC, so the whole composition oracles. */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, nLists: Int, nProbe: Int,
                 dim: Int, m: Int, ksub: Int,
                 ivfIters: Int = 1, pqIters: Int = 1): DataFrame = {
    register(corpus.sparkSession)
    val cents = Ivf.trainCentroids(corpus, idCol, vecCol, nLists, ivfIters)
    val books = trainCodebooks(corpus, idCol, vecCol, dim, m, ksub, pqIters)
    val enc = Ivf.assignCells(corpus, vecCol, cents)
      .select(col(idCol).as("nid"), col("__cell"),
        encodeCol(Knn.scaledVec(col(vecCol)), books).as("__codes"))
    val q = Ivf.probeCells(queries, vecCol, cents, nProbe)
      .select(col(idCol).as("qid"), col("__probe").as("__cell"),
        lutCol(Knn.scaledVec(col(vecCol)), books).as("__lut"))
    val scored = enc.join(broadcast(q), Seq("__cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("adc", adcCol(col("__lut"), col("__codes")))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("adc"))
  }
}
