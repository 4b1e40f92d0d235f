package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Dates
import graft.stats.Outliers

/** The validate-landings entry point (SURVEY §3.1,
  * `/root/reference/R/validate-landings.R:21-338`): a set of
  * per-dimension validators, each producing (submission_id, alert_k),
  * folded back onto the landings by submission_id, with the non-null
  * alert codes united into one '-'-separated string.
  *
  * Input contract (FIXTURES.md F2, flattened trip grain):
  * submission_id, landing_date (date), submission_time (timestamp),
  * imei (string partial), gear_code, duration_hrs, total_catch_value,
  * weight_kg. Each validator is one small dataflow; the whole function
  * is a single lazy plan — validators share the scan and fold with
  * co-partitioned left joins on submission_id.
  */
object ValidateLandings {

  final case class Config(
      maxTripHours: Double = 96.0,
      maxDelayDays: Int = 28,
      priceKgMin: Double = 0.25,
      priceKgMax: Double = 30.0,
      madK: Double = 2.5)

  /** Alert 4/2: non-positive or over-cap duration; late submission. */
  def validateTemporal(df: DataFrame, cfg: Config): DataFrame =
    df.select(col("submission_id"),
      when(col("duration_hrs") <= 0.0 || col("duration_hrs") > cfg.maxTripHours, lit(4))
        .as("alert_duration"),
      when(datediff(to_date(col("submission_time")), col("landing_date")) > cfg.maxDelayDays
        || col("landing_date") < to_date(lit("2017-01-01")), lit(2))
        .as("alert_date"))

  /** Alert 5/6/7: IMEI suffix resolution against the device registry
    * (ST10 ladder: too short → 5, ambiguous → 6, no match → 7). */
  def validateImei(df: DataFrame, registry: DataFrame): DataFrame =
    df.select(col("submission_id"), col("imei"))
      .join(broadcast(registry), col("device_imei").endsWith(col("imei")), "left")
      .groupBy(col("submission_id"), col("imei"))
      .agg(count(col("device_imei")).as("n_matches"),
        min(col("device_imei")).as("imei_resolved"))
      .select(col("submission_id"), col("imei_resolved"),
        when(length(col("imei")) < 5, lit(5))
          .when(col("n_matches") > 1, lit(6))
          .when(col("n_matches") === 0, lit(7))
          .as("alert_imei"))

  /** Alert 8: MAD/LocScaleB outlier bound on catch weight per gear
    * (ST1, with the reference's no-op guards). */
  def validateCatch(df: DataFrame, cfg: Config): DataFrame =
    Outliers.flagOutliers(
      df.select(col("submission_id"), col("gear_code"), col("weight_kg")),
      keys = Seq("gear_code"), x = "weight_kg", k = cfg.madK)
      .select(col("submission_id"),
        when(col("is_outlier"), lit(8)).as("alert_catch"))

  /** Alert 17: price-per-kg ratio outside the configured band. */
  def validatePrice(df: DataFrame, cfg: Config): DataFrame =
    df.select(col("submission_id"),
      when(col("weight_kg") > 0.0 &&
        (col("total_catch_value") / col("weight_kg") < cfg.priceKgMin ||
          col("total_catch_value") / col("weight_kg") > cfg.priceKgMax), lit(17))
        .as("alert_price"))

  /** Alert 9: unknown gear code (dimension membership, J4+J13). */
  def validateGear(df: DataFrame, gearDim: DataFrame): DataFrame =
    df.select(col("submission_id"), col("gear_code"))
      .join(broadcast(gearDim.withColumn("__known", lit(1))), Seq("gear_code"), "left")
      .select(col("submission_id"),
        when(col("__known").isNull, lit(9)).as("alert_gear"))

  /** The J10 fold: left-join every validator output on submission_id,
    * unite alert codes, null out values carrying alerts (the
    * reference's cleaned columns + `alert_number` sheet column). */
  def apply(landings: DataFrame, deviceRegistry: DataFrame, gearDim: DataFrame,
            cfg: Config = Config()): DataFrame = {
    val validators = Seq(
      validateTemporal(landings, cfg),
      validateImei(landings, deviceRegistry),
      validateCatch(landings, cfg),
      validatePrice(landings, cfg),
      validateGear(landings, gearDim))
    val folded = validators.foldLeft(landings) { (acc, v) =>
      acc.join(v.drop("imei"), Seq("submission_id"), "left")
    }
    val alertCols = Seq("alert_duration", "alert_date", "alert_imei",
      "alert_catch", "alert_price", "alert_gear")
    folded
      .withColumn("alert_number", Dates.uniteCodes(alertCols.map(col)))
      .withColumn("validated", col("alert_number") === "")
      .withColumn("weight_kg",
        when(col("alert_catch").isNotNull, lit(null)).otherwise(col("weight_kg")))
      .withColumn("total_catch_value",
        when(col("alert_price").isNotNull, lit(null)).otherwise(col("total_catch_value")))
      .drop(alertCols: _*)
  }
}
