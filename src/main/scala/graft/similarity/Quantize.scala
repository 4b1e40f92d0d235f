package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Symmetric per-dimension int8 quantization of an embedding column —
  * the compression step a 100 TB ANN index needs (4× smaller vectors,
  * integer SIMD distance kernels) — plus the per-dimension error report
  * that says whether int8 is safe for the corpus (builder mandate:
  * similarity search at scale).
  *
  * Everything is computed on SCALED-LONG elements (`floor(x·1e7+0.5)`,
  * [[Knn.scaledVec]]): per-dimension sums/extrema are exact int64/
  * decimal arithmetic, the quantized code `q = round(e·127 / maxAbs)`
  * derives from one deterministic IEEE division, and the absolute
  * reconstruction error `|e·127 − q·maxAbs| / (127·10⁷)` has an
  * INTEGER-EXACT numerator — so every statistic is order-independent,
  * parallelism-independent, and replayable by any ANSI engine (the q102
  * oracle).
  *
  * Scale shapes: one posexplode scan aggregates the 64-row (per-dim)
  * stats table with map-side combine; the stats broadcast back onto a
  * second scan for the error pass (two parallel scans, no wide shuffle
  * — dims are far too few to partition by, so per-dim work is collapsed
  * into aggregates, never a per-dim window over element rows).
  */
object Quantize {
  private val Dec0 = DecimalType(38, 0)
  private val Denom = 127.0 * Knn.Scale // error denominator, exact in double

  /** Exploded (id, dim, e) scaled-long element view. */
  private def elements(emb: DataFrame, idCol: String, vecCol: String) =
    emb.select(col(idCol).as("__id"),
      posexplode(Knn.scaledVec(col(vecCol))).as(Seq("dim", "e")))

  /** Per-dimension moments and the symmetric int8 scale
    * (dim, n, mean, std, max_abs): exact integer/decimal sums, one
    * final double formula per dimension. */
  def dimStats(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    elements(emb, idCol, vecCol)
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("e").cast(Dec0)).as("__s1"),
        sum((col("e") * col("e")).cast(Dec0)).as("__s2"),
        max(abs(col("e"))).as("__maxabs"))
      // scaled mean __m = s1/n once, then __m·__m (NOT pow(x, 2): an
      // engine may route pow through exp/log — multiplication is the
      // only cross-engine-exact square)
      .withColumn("__m", col("__s1").cast(DoubleType) / col("n"))
      .select(col("dim"), col("n"),
        (col("__m") / Knn.Scale).as("mean"),
        sqrt(greatest(lit(0.0),
          (col("__s2").cast(DoubleType) / col("n") - col("__m") * col("__m")) /
            lit(Knn.Scale * Knn.Scale)))
          .as("std"),
        (col("__maxabs").cast(DoubleType) / Knn.Scale).as("max_abs"),
        col("__maxabs").as("__maxabs"))

  /** Per-dimension int8 quantization error report:
    * (dim, n, mean, std, max_abs, mean_abs_err, max_abs_err). An
    * all-zero dimension (max_abs = 0) quantizes losslessly to 0. */
  def int8ErrorReport(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val stats = dimStats(emb, idCol, vecCol)
    val q = when(col("__maxabs") === 0L, lit(0L)).otherwise(
      least(lit(127L), greatest(lit(-127L),
        floor((col("e") * 127L).cast(DoubleType) / col("__maxabs") + 0.5).cast("long"))))
    elements(emb, idCol, vecCol)
      .join(broadcast(stats), Seq("dim"))
      .withColumn("__absnum", abs(col("e") * 127L - q * col("__maxabs")))
      .groupBy(col("dim"))
      .agg(
        first(col("n")).as("n"),
        first(col("mean")).as("mean"),
        first(col("std")).as("std"),
        first(col("max_abs")).as("max_abs"),
        (sum(col("__absnum").cast(Dec0)).cast(DoubleType) / count(lit(1)) / Denom)
          .as("mean_abs_err"),
        (max(col("__absnum")).cast(DoubleType) / Denom).as("max_abs_err"))
  }

  /** Quantized vectors: (idCol, codes array<long> in [-127, 127], in
    * dimension order). The per-dim scales broadcast onto the element
    * scan; codes re-nest through a sorted struct collect (dims carry
    * their index, so the array is deterministic — the A14 nest rule).
    * Downstream stores codes as int8 and dequantizes with
    * `code · max_abs / 127`. */
  def quantizeVectors(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scales = dimStats(emb, idCol, vecCol).select(col("dim"), col("__maxabs"))
    val q = when(col("__maxabs") === 0L, lit(0L)).otherwise(
      least(lit(127L), greatest(lit(-127L),
        floor((col("e") * 127L).cast(DoubleType) / col("__maxabs") + 0.5).cast("long"))))
    elements(emb, idCol, vecCol)
      .join(broadcast(scales), Seq("dim"))
      .select(col("__id"), struct(col("dim"), q.as("q")).as("__dq"))
      .groupBy(col("__id"))
      .agg(transform(array_sort(collect_list(col("__dq"))), s => s("q")).as("codes"))
      .withColumnRenamed("__id", idCol)
  }

  /** Quantized-scan ANN with exact re-rank — the Faiss flat-SQ8 shape:
    * score every (query, corpus) pair on int8 CODES (4× less memory
    * bandwidth than floats, the resource that bounds a flat scan at
    * 100 TB), keep the top `candK` candidates per query, then re-rank
    * ONLY those with the exact scaled-long cosine and emit top `k`.
    *
    * The candidate score is the dequantized dot product numerator
    * `Σ_d qa_d · qb_d · maxabs_d²` — per-term int64 (|q| ≤ 127,
    * maxabs ≤ 1e7 ⇒ |term| ≤ 1.7e18), summed as DECIMAL(38,0), so
    * candidate selection is integer-exact and engine-replayable (the
    * q114 oracle replays codes, scores and both rankings). Scoring by
    * dot numerator, not cosine: candidate generation is a MIPS proxy
    * (unit-ish norms), and the exact re-rank restores true cosine
    * order among survivors. Queries are quantized with the CORPUS
    * per-dim scales — the codebook is a corpus artifact (in production
    * codes + scales are materialized once, not derived per query
    * batch).
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, candK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scales = dimStats(corpus, idCol, vecCol).select(col("dim"), col("__maxabs"))
    def codesWith(emb: DataFrame): DataFrame = {
      val q = when(col("__maxabs") === 0L, lit(0L)).otherwise(
        least(lit(127L), greatest(lit(-127L),
          floor((col("e") * 127L).cast(DoubleType) / col("__maxabs") + 0.5).cast("long"))))
      elements(emb, idCol, vecCol)
        .join(broadcast(scales), Seq("dim"))
        .select(col("__id"), struct(col("dim"), q.as("q")).as("__dq"))
        .groupBy(col("__id"))
        .agg(transform(array_sort(collect_list(col("__dq"))), s => s("q")).as("codes"))
    }
    val s2 = broadcast(scales
      .select(struct(col("dim"), (col("__maxabs") * col("__maxabs")).as("s2")).as("__ds"))
      .agg(transform(array_sort(collect_list(col("__ds"))), s => s("s2")).as("__s2")))
    val cc = codesWith(corpus).select(col("__id").as("nid"), col("codes").as("__cc"))
    val qc = broadcast(codesWith(queries)
      .select(col("__id").as("qid"), col("codes").as("__qc")))
    val approx = cc.join(qc, col("qid") =!= col("nid")).crossJoin(s2)
      .withColumn("__score", aggregate(
        zip_with(zip_with(col("__qc"), col("__cc"), (x, y) => x * y),
          col("__s2"), (p, s) => p * s),
        lit(0).cast(Dec0), (acc, x) => acc + x.cast(Dec0)))
    val wc = Window.partitionBy(col("qid")).orderBy(col("__score").desc, col("nid").asc)
    val cand = approx.withColumn("__cr", row_number().over(wc))
      .filter(col("__cr") <= candK)
      .select(col("qid"), col("nid"))
    // exact re-rank on the surviving candidates only
    val cv = corpus.select(col(idCol).as("nid"),
      Knn.scaledVec(col(vecCol)).as("__cv"))
      .withColumn("__cn2", Knn.norm2Scaled(col("__cv")))
    val qv = broadcast(queries.select(col(idCol).as("qid"),
      Knn.scaledVec(col(vecCol)).as("__qv"))
      .withColumn("__qn2", Knn.norm2Scaled(col("__qv"))))
    val wk = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    cand.join(cv, "nid").join(qv, "qid")
      .withColumn("cos", Knn.dotScaled(col("__qv"), col("__cv")) /
        (sqrt(col("__qn2")) * sqrt(col("__cn2"))))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }
}
