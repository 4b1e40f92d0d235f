package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals for grouped corpus metrics.
  *
  * The classical bootstrap resamples n rows WITH replacement — a
  * per-resample global shuffle, unusable at 100 TB. The Poisson
  * bootstrap (Chamandy et al., "Estimating Uncertainty for Massive
  * Data Streams", Google 2012) replaces the multinomial draw with an
  * independent Poisson(1) weight per (row, resample): one streaming
  * pass computes every resample's weighted aggregate, map-side
  * combined, shuffling only |groups| × R partial sums.
  *
  * Draws follow the pipeline's ST8 policy (seeded md5-uniform through
  * the Poisson(1) inverse CDF, capped at 6 — P(X>6) < 1e-4), so any
  * engine replays the exact interval. Estimates are ratios of exact
  * integer sums and the order-statistic interpolation uses shared
  * double literals, so the DuckDB oracle hash-matches bit-for-bit.
  */
object Bootstrap {
  /** Cumulative P(X <= k) for Poisson(1), k = 0..5 (then capped). */
  private val Cum = Seq(
    0.3678794411714423, 0.7357588823428846, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  /** Deterministic Poisson(1) draw keyed by `key` (seeded md5 uniform
    * through the inverse CDF; capped at 6). */
  def poissonWeight(key: Column, seed: String): Column = {
    val u = Privacy.uniform01(key, seed)
    Cum.zipWithIndex.foldRight(lit(6): Column) { case ((c, k), rest) =>
      when(u < lit(c), lit(k)).otherwise(rest)
    }.cast("long")
  }

  /** 95% bootstrap CI of the per-group mean of `valueCol` (long),
    * R = 32 resamples.
    *
    * Returns (group, point_mean, ci_lo, ci_hi, n_resamples). The
    * quantiles are R-type-7 at p = 0.025/0.975: with R = 32,
    * h = 31p lands at 0.775 and 30.225, so the bounds interpolate
    * order statistics 1–2 and 31–32 with weights 0.775/0.225 (shared
    * literals — NOT computed — so the oracle's arithmetic is
    * identical).
    *
    * One pass over rows × R (map-side combined), one |groups|×R
    * shuffle, one tiny window. */
  def ciMean(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      seed: String): DataFrame = {
    val R = 32
    val key = concat(col(idCol).cast("string"), lit(":"), col("r"))
    val est = df
      .select(col(groupCol), col(idCol), col(valueCol))
      .withColumn("r", explode(array((0 until R).map(lit): _*)))
      .withColumn("w", poissonWeight(key, seed))
      .groupBy(col(groupCol), col("r"))
      .agg(
        sum(col("w") * col(valueCol)).as("wsum"),
        sum(col("w")).as("wn"))
      .filter(col("wn") > 0)
      .select(col(groupCol),
        (col("wsum").cast("double") / col("wn").cast("double")).as("est"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("est"))
    val ranked = est
      .withColumn("rn", row_number().over(w))
      .withColumn("nr", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .filter(col("nr") === R) // all resamples present (wn=0 never fires in practice)
    val point = df.groupBy(col(groupCol)).agg(
      (sum(col(valueCol)).cast("double") / count(lit(1)).cast("double"))
        .as("point_mean"))
    val ci = ranked.groupBy(col(groupCol)).agg(
      round(
        sum(when(col("rn") === 1, col("est") * lit(0.225))
          .when(col("rn") === 2, col("est") * lit(0.775))), 4).as("ci_lo"),
      round(
        sum(when(col("rn") === 31, col("est") * lit(0.775))
          .when(col("rn") === 32, col("est") * lit(0.225))), 4).as("ci_hi"),
      max(col("nr")).as("n_resamples"))
    point.join(ci, Seq(groupCol), "inner")
      .select(col(groupCol), round(col("point_mean"), 4).as("point_mean"),
        col("ci_lo"), col("ci_hi"), col("n_resamples"))
  }

  /** Paired Poisson-bootstrap comparison of two per-unit metrics — the
    * standard eval answer to "is system A better than B on the SAME
    * units?" (significance testing for system comparisons; Koehn 2004's
    * paired bootstrap, Poisson-weighted for one streaming pass): each
    * (unit, resample) draws ONE weight applied to the paired DELTA, so
    * unit-level correlation is preserved — unpaired intervals overlap
    * even when A beats B on almost every unit. Returns the point
    * delta, the 95% type-7 CI over resample deltas (the ciMean
    * interpolation literals), and the resample win count (est > 0) —
    * n_win / n_resamples is the bootstrap P(A > B).
    * Metrics must be integer-valued (accuracy indicators, counts);
    * scale fractional metrics upstream. */
  def pairedComparison(df: DataFrame, idCol: String, aCol: String,
                       bCol: String, seed: String): DataFrame = {
    val R = 32
    val base = df.select(col(idCol).as("__id"),
      (col(aCol).cast("long") - col(bCol).cast("long")).as("__d"))
    val key = concat(col("__id").cast("string"), lit(":"), col("r"))
    val est = base
      .withColumn("r", explode(array((0 until R).map(lit): _*)))
      .withColumn("w", poissonWeight(key, seed))
      .groupBy(col("r"))
      .agg(sum(col("w") * col("__d")).as("ws"), sum(col("w")).as("wn"))
      .filter(col("wn") > 0)
      .select((col("ws").cast("double") / col("wn").cast("double")).as("est"))
    // R rows through one ordered window — same bounded shape as ciMean
    val ranked = est.withColumn("rn",
      row_number().over(Window.orderBy(col("est"))))
    val ci = ranked.agg(
      round(sum(when(col("rn") === 1, col("est") * lit(0.225))
        .when(col("rn") === 2, col("est") * lit(0.775))), 4).as("ci_lo"),
      round(sum(when(col("rn") === 31, col("est") * lit(0.775))
        .when(col("rn") === 32, col("est") * lit(0.225))), 4).as("ci_hi"),
      sum(when(col("est") > 0, lit(1L)).otherwise(lit(0L))).as("n_win"),
      count(lit(1)).as("n_resamples"))
    val point = base.agg(
      round(sum(col("__d")).cast("double") / count(lit(1)).cast("double"), 4)
        .as("point_delta"),
      count(lit(1)).as("n_units"))
    point.crossJoin(ci)
      .select(col("point_delta"), col("n_units"), col("ci_lo"), col("ci_hi"),
        col("n_win"), col("n_resamples"))
  }
}
