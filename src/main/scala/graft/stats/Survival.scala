package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Exact._

/** Kaplan–Meier product-limit survival estimator over right-censored
  * durations — the churn/lifetime census a product-analytics layer
  * runs beside the retention matrix (q317): retention asks "what
  * fraction of a cohort is active k weeks later", KM asks "what is
  * the probability a unit SURVIVES past duration t" while correctly
  * using censored units (still-active users whose true lifetime is
  * only known to exceed their observation window) for as long as
  * they are at risk. The reference has no survival layer; this is a
  * training-data-ops extension in the q317 family (cohorts/funnels
  * live in `R/format-public-data.R`'s rollup vocabulary).
  *
  * Scale shape: the caller's duration frame is one shuffle on the
  * unit key; this operator then works on the DISTINCT-duration frame
  * (calendar-bounded — days, not units), so every window here is
  * over at most a few thousand rows regardless of fact size.
  *
  * Determinism: n_risk and d_t are exact integers; each step factor
  * 1 − d/n is ONE IEEE division; the cumulative log-sum routes
  * through the DECIMAL(38,6) window (order-fixed, so partitioning
  * never reorders it) and the final exp+round(6) is deterministic.
  * A step with d = n_risk drives survival to exactly 0 — flagged
  * through an integer window max rather than ln(0), whose result
  * differs between engines (Spark NULL, DuckDB −inf).
  */
object Survival {

  /** KM curve from per-unit (duration, observed) rows. Emits one row
    * per distinct duration with at least one OBSERVED event:
    * (t, n_risk, d_events, n_censored, survival). `durCol` must be
    * non-negative integral; `observedCol` boolean (false = censored).
    */
  def kaplanMeier(units: DataFrame, durCol: String, observedCol: String): DataFrame = {
    val byT = units.groupBy(col(durCol).cast("long").as("t"))
      .agg(lcount(lit(1)).as("n_at"),
        coalesce(sum(when(col(observedCol), 1L)), lit(0L)).as("d_events"))
      .withColumn("n_censored", col("n_at") - col("d_events"))
    val ord = Window.orderBy(col("t"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    byT
      .withColumn("n_total",
        sum(col("n_at")).over(ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("n_risk", col("n_total") - coalesce(sum(col("n_at")).over(prev), lit(0L)))
      .withColumn("ln_factor",
        when(col("d_events") === 0, lit(0.0))
          .when(col("d_events") < col("n_risk"),
            log(lit(1.0) - col("d_events").cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("hit_zero",
        max(when(col("d_events") >= col("n_risk"), 1).otherwise(0)).over(cum))
      .withColumn("survival",
        when(col("hit_zero") === 1, lit(0.0))
          .otherwise(round(exp(dsumOver(col("ln_factor"), cum)), 6)))
      .filter(col("d_events") > 0)
      .select(col("t"), col("n_risk"), col("d_events"), col("n_censored"),
        col("survival"))
      .orderBy(col("t"))
  }
}
