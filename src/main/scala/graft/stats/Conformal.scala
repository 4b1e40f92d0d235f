package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split conformal prediction (Vovk et al.; Lei et al., JASA 2018) —
  * the distribution-free interval wrapper a scoring pipeline puts
  * around a point predictor before trusting it to gate data: given a
  * calibration/test split and a per-row point prediction, the
  * calibration residuals' ⌈(n+1)(1−α)⌉-th smallest absolute value is
  * the half-width q̂ such that [ŷ − q̂, ŷ + q̂] covers the true value
  * with probability ≥ 1−α on exchangeable data.
  *
  * This is the GROUP-CONDITIONAL (Mondrian) variant: q̂ is computed per
  * group (e.g. per language), so coverage holds within each group
  * rather than only marginally — the form a multilingual curation
  * pipeline actually needs.
  *
  * Scale shape: one filter + count per group, one rank window per
  * group over CALIBRATION rows only (the same per-group sort
  * discipline as [[SortPercentile]] — calibration is typically a
  * hash-sampled fraction, so the sorted side is the small one), then a
  * broadcast of the per-group q̂ onto test rows for a map-side coverage
  * aggregate. No driver-side collection; group count bounds every
  * broadcast.
  *
  * Determinism: the conformal rank k = ⌈(n+1)·(denom−num)/denom⌉ is
  * computed in INTEGER arithmetic (α = num/denom), so no IEEE ceil
  * edge can flip the chosen order statistic; q̂ is the residual VALUE
  * at rank k, well-defined under ties regardless of tie order. Groups
  * whose calibration set is too small for rank k (k > n_cal) get a
  * NULL q̂ = the infinite interval, counted as always covered —
  * exactly the textbook convention.
  */
object Conformal {

  /** One row per group: (group, n_cal, n_test, qhat, coverage).
    * `isCalib` marks calibration rows (the rest are test rows);
    * α = `alphaNum`/`alphaDen` (default 1/10). qhat and coverage are
    * rounded to 6; qhat is NULL when the group's calibration set is
    * smaller than the conformal rank. */
  def splitConformal(df: DataFrame, groupCol: String, y: Column, yhat: Column,
                     isCalib: Column, alphaNum: Int = 1, alphaDen: Int = 10): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be a rational in (0,1), got $alphaNum/$alphaDen")
    val keep = alphaDen - alphaNum // (1-α) numerator
    val base = df.select(col(groupCol),
      abs(y.cast("double") - yhat.cast("double")).as("__r"),
      isCalib.as("__cal"))
    val cal = base.filter(col("__cal"))
    val nc = cal.groupBy(col(groupCol)).agg(count(lit(1)).as("n_cal"))
      // k = ⌈(n_cal+1)·keep/alphaDen⌉ via (a + d − 1) div d; the double
      // division is exact (numerator made divisible, magnitudes ≪ 2^53)
      .withColumn("__num", (col("n_cal") + 1) * keep + (alphaDen - 1))
      .withColumn("__k",
        ((col("__num") - pmod(col("__num"), lit(alphaDen.toLong))) / alphaDen).cast("long"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__r").asc)
    val qhat = cal.withColumn("__rn", row_number().over(w))
      .join(broadcast(nc), Seq(groupCol))
      .filter(col("__rn") === col("__k"))
      .select(col(groupCol), col("__r").as("__qhat"))
    val test = base.filter(!col("__cal"))
      .join(broadcast(nc.select(col(groupCol))), Seq(groupCol)) // groups seen in calibration
      .join(broadcast(qhat), Seq(groupCol), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__qhat").isNull || col("__r") <= col("__qhat"), 1L)
          .otherwise(0L)).as("__ncov"),
        first(col("__qhat")).as("__qhat"))
    test.join(broadcast(nc.select(col(groupCol), col("n_cal"))), Seq(groupCol))
      .select(col(groupCol), col("n_cal"), col("n_test"),
        round(col("__qhat"), 6).as("qhat"),
        round(col("__ncov").cast("double") / col("n_test"), 6).as("coverage"))
  }
}
