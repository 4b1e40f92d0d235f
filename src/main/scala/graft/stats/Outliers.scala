package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MAD-based robust outlier bounds — the reference's `alert_outlier` /
  * `univOutl::LocScaleB` kernel (`/root/reference/R/validation-functions.R:243-280`):
  * on the log1p scale, bounds = median ± k · (1.4826 · MAD), back-
  * transformed with `exp(b) − 1`; values outside are flagged. Guards
  * (all-NA-or-zero input, MAD ≤ 0) disable flagging for the group.
  *
  * Implemented relationally as two exact-percentile passes over a
  * grouped frame — a per-group shuffle-free second pass because the
  * bounds frame is broadcast back. Exact `percentile` (R type-7 linear
  * interpolation) keeps oracle parity; swap to `percentile_approx` above
  * a group-size threshold at very large scale.
  */
object Outliers {
  val MadScale = 1.4826

  /** Per-key LocScaleB bounds of `x` on the log1p scale.
    * Output: keys ++ (median_log, mad_log, lower, upper).
    *
    * `exact = true` (default) computes both medians via
    * [[SortPercentile]] over a (value, count) histogram: ONE pass over
    * the data builds the histogram, the MAD median then folds
    * |value − median| on the histogram itself (monotone ln keeps value
    * order, abs merges mirrored values by summing weights) — no second
    * data pass and no per-group memory buffer, so a skewed 100 TB group
    * sorts/spills instead of OOMing. `exact = false` swaps in
    * `percentile_approx` (accuracy 10⁴, constant memory): MAD bounds
    * are a robustness heuristic, so the ±1e-4-quantile wobble doesn't
    * change which points are flagged in practice. */
  /** The shared exact-path machinery: the (value,count) histogram and
    * the guarded bounds derived from it. */
  private def histAndBounds(df: DataFrame, keys: Seq[String], x: String,
                            k: Double): (DataFrame, DataFrame) = {
    val kc = keys.map(col)
    val hist = df
      .groupBy(kc :+ col(x).as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__vl", log(lit(1.0) + col("__v")))
    val med = SortPercentile.fromCounts(
      hist, keys, "__vl", "__c", Seq(0.5), Seq("median_log"),
      assumeUnique = true) // hist is one row per (keys, value); ln is injective
    val nz = hist.groupBy(kc: _*)
      .agg(sum(when(col("__v").isNotNull && col("__v") =!= 0.0, col("__c"))
        .otherwise(lit(0L))).as("__n_nonzero"))
    val absHist = hist.join(broadcast(med), keys)
      .groupBy(kc :+ abs(col("__vl") - col("median_log")).as("__a"): _*)
      .agg(sum(col("__c")).as("__c"))
    val mad = SortPercentile.fromCounts(
      absHist, keys, "__a", "__c", Seq(0.5), Seq("__mad_raw"),
      assumeUnique = true) // absHist re-grouped on the folded value
    val bounds = med.join(mad, keys).join(nz, keys)
      .withColumn("mad_log", col("__mad_raw") * lit(MadScale))
      .drop("__mad_raw")
    (hist, bounds)
  }

  /** Bounds plus per-key outlier census in ONE pass over the data: the
    * same histogram that feeds the medians answers "how many rows fall
    * outside" — no second scan, no flag join. Output: keys ++
    * (median_log, mad_log, lower, upper, n_outliers, n). */
  def boundsCensus(df: DataFrame, keys: Seq[String], x: String,
                   k: Double): DataFrame = {
    val (hist, bounds0) = histAndBounds(df, keys, x, k)
    val bounds = guard(bounds0, k)
    hist.join(broadcast(bounds), keys)
      .groupBy(keys.map(col): _*)
      .agg(
        first(col("median_log")).as("median_log"),
        first(col("mad_log")).as("mad_log"),
        first(col("lower")).as("lower"),
        first(col("upper")).as("upper"),
        sum(when(col("lower").isNotNull &&
          (col("__v") < col("lower") || col("__v") > col("upper")), col("__c"))
          .otherwise(lit(0L))).as("n_outliers"),
        sum(col("__c")).as("n"))
  }

  private def guard(bounds0: DataFrame, k: Double): DataFrame =
    bounds0
      .withColumn("lower",
        when(col("__n_nonzero") > 0 && col("mad_log") > 0.0,
          exp(col("median_log") - lit(k) * col("mad_log")) - lit(1.0)))
      .withColumn("upper",
        when(col("__n_nonzero") > 0 && col("mad_log") > 0.0,
          exp(col("median_log") + lit(k) * col("mad_log")) - lit(1.0)))
      .drop("__n_nonzero")

  def madBoundsLog1p(df: DataFrame, keys: Seq[String], x: String, k: Double,
                     exact: Boolean = true): DataFrame = {
    val bounds0 =
      if (exact) {
        histAndBounds(df, keys, x, k)._2
      } else {
        val xl = log(lit(1.0) + col(x))
        def pct(c: Column): Column = percentile_approx(c, lit(0.5), lit(10000))
        val med = df.groupBy(keys.map(col): _*)
          .agg(pct(xl).as("median_log"))
        df.join(broadcast(med), keys)
          .groupBy(keys.map(col): _*)
          .agg(
            first(col("median_log")).as("median_log"),
            (pct(abs(xl - col("median_log"))) * lit(MadScale)).as("mad_log"),
            sum(when(col(x).isNotNull && col(x) =!= 0.0, lit(1L))
              .otherwise(lit(0L))).as("__n_nonzero"))
      }
    guard(bounds0, k)
      .select((keys.map(col) ++ Seq(col("median_log"), col("mad_log"),
        col("lower"), col("upper"))): _*)
  }

  /** Join bounds back and flag rows outside them (null bounds ⇒ never
    * flagged, matching the reference's no-op guards). */
  def flagOutliers(df: DataFrame, keys: Seq[String], x: String, k: Double,
                   flagCol: String = "is_outlier"): DataFrame = {
    val bounds = madBoundsLog1p(df, keys, x, k)
    df.join(broadcast(bounds), keys)
      .withColumn(flagCol,
        col("lower").isNotNull &&
          (col(x) < col("lower") || col(x) > col("upper")))
  }
}
