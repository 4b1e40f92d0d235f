package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.ValidateLandings

/** Streaming face of the validate-landings entry point (SURVEY §3.1 ×
  * §2.10): the reference re-validates the WHOLE landings table every
  * two days; on Spark the trip-local validators are pure column
  * expressions plus broadcast-dim joins, so they apply to an unbounded
  * stream unchanged — each micro-batch is validated as it arrives.
  *
  * The one genuinely global piece — the MAD outlier bounds (fishers,
  * gleaners, fuel) — cannot be computed on an unbounded stream without
  * redefining the reference's semantics (its bounds see the full
  * history). The production split mirrors slowly-changing-dimension
  * practice: bounds are computed BATCH-side on history
  * (`ValidateLandings`'s stacked pass / `Outliers`), passed here as a
  * one-row static frame, and refreshed on the reference's own cadence.
  * Stream-static joins rebroadcast per micro-batch, so a bounds refresh
  * lands without restarting the query.
  *
  * Covered alerts: duration (5), dates (4/10), sites (16), habitat
  * (19), mesh (20), fishers (18), gleaners (21), fuel (23) — every
  * validator whose inputs are a single submission plus dims/bounds.
  * The catch-side ladder (22/6/11/17) aggregates a trip's catch ROWS;
  * in streaming it composes as a per-trip `Sessionize`-style state or
  * stays in the batch half of a lambda split — kept batch-side here,
  * as the reference's sheet round-trip is inherently batch.
  */
object ValidateStreaming {

  /** Static one-row bounds frame from the batch side: columns
    * `__med_<m>`, `__mad_<m>`, `__ok_<m>` for each of the five global
    * metrics — the exact shape `ValidateLandings`' stacked pass emits. */
  def validate(trips: DataFrame, bounds: DataFrame,
               sites: DataFrame, habitatDim: DataFrame,
               cfg: ValidateLandings.Config = ValidateLandings.Config()): DataFrame = {
    def loOf(n: String, k: Double) =
      when(col(s"__ok_$n") === 1, exp(col(s"__med_$n") - lit(k) * col(s"__mad_$n")) - lit(1.0))
    def hiOf(n: String, k: Double) =
      when(col(s"__ok_$n") === 1, exp(col(s"__med_$n") + lit(k) * col(s"__mad_$n")) - lit(1.0))

    val dur = abs(col("duration_hrs"))
    val durBad = dur > cfg.maxTripHours || dur < 1.0
    val aDate = when(col("landing_date") > col("submission_date"), lit(4))
      .when(col("landing_date") < date_sub(col("submission_date"), cfg.maxDelayDays), lit(10))
    val mm = coalesce(
      when(col("mesh_size") === "seluk", lit(null)).otherwise(col("mesh_size")),
      col("mesh_other")).cast("double") * lit(25.4)
    def fisher(c: String) = col(c).cast("double")
    def outside(c: String) = hiOf(c, cfg.kFishers).isNotNull &&
      (fisher(c) < loOf(c, cfg.kFishers) || fisher(c) > hiOf(c, cfg.kFishers))
    val aFishers = when(
      Seq("fisher_child", "fisher_man", "fisher_woman").map(outside).reduce(_ || _), lit(18))
    val gle = abs(col("n_gleaners").cast("double"))
    val gleanerFlag = hiOf("n_gleaners", cfg.kGleaners).isNotNull &&
      gle > hiOf("n_gleaners", cfg.kGleaners)
    val fuelD = col("fuel").cast("double")
    val fuelFlag = hiOf("fuel", cfg.kFuel).isNotNull && fuelD > hiOf("fuel", cfg.kFuel)

    trips
      .withColumn("__scode", col("station_code").cast("string"))
      .join(broadcast(sites), Seq("__scode"), "left")
      .join(broadcast(habitatDim.withColumn("__known", lit(1))),
        Seq("habitat_code"), "left")
      .crossJoin(broadcast(bounds))
      .select(
        col("submission_id"), col("landing_date"),
        when(durBad, lit(null).cast("double")).otherwise(dur).as("trip_length"),
        col("station_name"), col("reporting_region"),
        when(aFishers.isNull, fisher("fisher_child")).as("fisher_child"),
        when(aFishers.isNull, fisher("fisher_man")).as("fisher_man"),
        when(aFishers.isNull, fisher("fisher_woman")).as("fisher_woman"),
        when(mm >= 0 && mm <= cfg.meshLimitMm, mm).as("mesh_size_mm"),
        when(!gleanerFlag, gle).as("n_gleaners"),
        when(fuelD >= 0 && !fuelFlag, fuelD).as("fuel"),
        graft.functions.Dates.uniteCodes(Seq(
          aDate,
          when(durBad, lit(5)),
          when(col("station_name").isNull || col("reporting_region").isNull, lit(16)),
          aFishers,
          when(col("habitat_code").isNotNull && col("__known").isNull, lit(19)),
          when(mm < 0 || mm > cfg.meshLimitMm, lit(20)),
          when(gleanerFlag, lit(21)),
          when(fuelD < 0, lit(23)).when(fuelFlag, lit(23)))).as("alert"))
      .withColumn("alert",
        when(col("alert") === "", lit("0")).otherwise(col("alert")))
  }
}
