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
    * `exact = true` (default) uses exact `percentile` — R-type-7 parity
    * for the oracle. At very large group sizes switch to `exact =
    * false`: `percentile_approx` (accuracy 10⁴) keeps memory constant
    * per group where the exact aggregate buffers every value; MAD
    * bounds are already a robustness heuristic, so the ±1e-4-quantile
    * wobble doesn't change which points are outliers in practice. */
  def madBoundsLog1p(df: DataFrame, keys: Seq[String], x: String, k: Double,
                     exact: Boolean = true): DataFrame = {
    val xl = log(lit(1.0) + col(x))
    def pct(c: Column): Column =
      if (exact) percentile(c, lit(0.5))
      else percentile_approx(c, lit(0.5), lit(10000))
    val med = df.groupBy(keys.map(col): _*)
      .agg(pct(xl).as("median_log"))
    val withMed = df.join(broadcast(med), keys)
    withMed
      .groupBy(keys.map(col): _*)
      .agg(
        first(col("median_log")).as("median_log"),
        (pct(abs(xl - col("median_log"))) * lit(MadScale)).as("mad_log"),
        count(when(col(x).isNotNull && col(x) =!= 0.0, lit(1))).as("__n_nonzero"))
      .withColumn("lower",
        when(col("__n_nonzero") > 0 && col("mad_log") > 0.0,
          exp(col("median_log") - lit(k) * col("mad_log")) - lit(1.0)))
      .withColumn("upper",
        when(col("__n_nonzero") > 0 && col("mad_log") > 0.0,
          exp(col("median_log") + lit(k) * col("mad_log")) - lit(1.0)))
      .drop("__n_nonzero")
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
