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
  /** The shared exact-path machinery: the (log1p value, count)
    * histogram and the guarded bounds derived from it.
    *
    * The histogram keys on `__vl = ln(1+x)` ONLY (ln is injective on
    * x > −1, so the distinct structure is identical to keying on x):
    * every consumer — both percentile passes, the nonzero census, the
    * outlier census — then reads the byte-identical `(keys, __vl, __c)`
    * subtree, which lets ReuseExchange collapse what was 5 separate
    * scans+aggregations of the base data into one executed exchange
    * (measured: q24 5 scans → 1 at sf0.1). */
  private def histAndBounds(df: DataFrame, keys: Seq[String], x: String,
                            k: Double): (DataFrame, DataFrame) = {
    val kc = keys.map(col)
    val hist = df
      .groupBy(kc :+ log(lit(1.0) + col(x)).as("__vl"): _*)
      .agg(count(lit(1)).as("__c"))
    // x = 0 ⟺ ln(1+x) = 0, so the nonzero guard reads the log histogram
    // — folded into the median's per-key aggregation pass (extraAggs)
    // instead of a second aggregation branch + join over the histogram
    val med = SortPercentile.fromCounts(
      hist, keys, "__vl", "__c", Seq(0.5), Seq("median_log"),
      assumeUnique = true, // hist is one row per (keys, log value)
      extraAggs = Seq(
        (sum(when(col("__vl").isNotNull && col("__vl") =!= 0.0, col("__c"))
          .otherwise(lit(0L))), "__n_nonzero")))
    val absHist = hist.join(broadcast(med.drop("__n_nonzero")), keys)
      .groupBy(kc :+ abs(col("__vl") - col("median_log")).as("__a"): _*)
      .agg(sum(col("__c")).as("__c"))
    val mad = SortPercentile.fromCounts(
      absHist, keys, "__a", "__c", Seq(0.5), Seq("__mad_raw"),
      assumeUnique = true) // absHist re-grouped on the folded value
    // both sides are group-grain bounds frames (broadcast downstream by
    // every consumer by design) — hint the join so it never plans as a
    // sort-merge with two extra sorts on the critical path
    val bounds = med.join(broadcast(mad), keys)
      .withColumn("mad_log", col("__mad_raw") * lit(MadScale))
      .drop("__mad_raw")
    (hist, bounds)
  }

  /** Bounds plus per-key outlier census in ONE pass over the data: the
    * same histogram that feeds the medians answers "how many rows fall
    * outside" — no second scan, no flag join. The census compares on
    * the LOG axis (x > upper ⟺ ln(1+x) > median+k·mad up to ln's
    * monotonicity), keeping the comparison free of exp() round-trips
    * and the histogram subtree shared. Output: keys ++ (median_log,
    * mad_log, lower, upper, n_outliers, n). */
  def boundsCensus(df: DataFrame, keys: Seq[String], x: String,
                   k: Double): DataFrame = {
    val (hist, bounds0) = histAndBounds(df, keys, x, k)
    val bounds = guard(bounds0, k, keepLogBounds = true)
    hist.join(broadcast(bounds), keys)
      .groupBy(keys.map(col): _*)
      .agg(
        first(col("median_log")).as("median_log"),
        first(col("mad_log")).as("mad_log"),
        first(col("lower")).as("lower"),
        first(col("upper")).as("upper"),
        sum(when(col("__lower_log").isNotNull &&
          (col("__vl") < col("__lower_log") || col("__vl") > col("__upper_log")), col("__c"))
          .otherwise(lit(0L))).as("n_outliers"),
        sum(col("__c")).as("n"))
  }

  /** [[boundsCensus]] on the `percentile_approx` path: three scans, no
    * per-group sort — the 100-TB shape. Bounds come from approximate
    * medians (accuracy 1e-4 of rank); the census compares on the
    * ORIGINAL scale against the back-transformed bounds (monotone ⇒
    * same flags as the log-scale compare). */
  def boundsCensusApprox(df: DataFrame, keys: Seq[String], x: String,
                         k: Double): DataFrame = {
    val bounds = madBoundsLog1p(df, keys, x, k, exact = false)
    df.join(broadcast(bounds), keys)
      .groupBy(keys.map(col): _*)
      .agg(
        first(col("median_log")).as("median_log"),
        first(col("mad_log")).as("mad_log"),
        first(col("lower")).as("lower"),
        first(col("upper")).as("upper"),
        sum(when(col("lower").isNotNull &&
          (col(x) < col("lower") || col(x) > col("upper")), lit(1L))
          .otherwise(lit(0L))).as("n_outliers"),
        count(lit(1)).as("n"))
  }

  /** The documented scale switch: exact type-7 percentiles up to
    * `maxExactRows` input rows, `percentile_approx` above. MAD bounds
    * are a robustness heuristic — the ±1e-4-rank wobble does not move
    * the flag census (asserted against the exact path in StatsSpec) —
    * so paying a full per-group histogram sort at cluster scale buys
    * nothing. The row count is a driver-side decision (one cheap
    * count job), the entry-point pattern used across the pipeline. */
  def boundsCensusAuto(df: DataFrame, keys: Seq[String], x: String, k: Double,
                       maxExactRows: Long = 200000L): DataFrame =
    if (df.limit((maxExactRows + 1).toInt).count() > maxExactRows)
      boundsCensusApprox(df, keys, x, k)
    else boundsCensus(df, keys, x, k)

  private def guard(bounds0: DataFrame, k: Double,
                    keepLogBounds: Boolean = false): DataFrame = {
    val ok = col("__n_nonzero") > 0 && col("mad_log") > 0.0
    val guarded = bounds0
      .withColumn("__lower_log", when(ok, col("median_log") - lit(k) * col("mad_log")))
      .withColumn("__upper_log", when(ok, col("median_log") + lit(k) * col("mad_log")))
      .withColumn("lower", when(ok, exp(col("__lower_log")) - lit(1.0)))
      .withColumn("upper", when(ok, exp(col("__upper_log")) - lit(1.0)))
      .drop("__n_nonzero")
    if (keepLogBounds) guarded else guarded.drop("__lower_log", "__upper_log")
  }

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
