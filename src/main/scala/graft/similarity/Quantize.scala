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
}
