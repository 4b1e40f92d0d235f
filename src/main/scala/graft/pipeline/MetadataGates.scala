package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Metadata-table quality gates (SURVEY §5's assert-style checks,
  * `/root/reference/R/preprocess-metadata-tables.R:113-344`): each
  * `pt_validate_*` coerces types and fail-fast `stop()`s on integrity
  * violations. Here every gate computes its violation census in ONE
  * aggregate job and throws with the count — the driver-side assert
  * pattern the rest of the pipeline uses (bounded work: these are
  * dimension tables).
  */
object MetadataGates {

  private def fail(gate: String, n: Long, what: String): Nothing =
    throw new IllegalStateException(s"$gate: $n $what")

  /** `pt_validate_vms_installs` (`:113-145`): damage events must
    * postdate installation per device. The reference compares the two
    * date vectors POSITIONALLY with R recycling — not well-defined
    * relationally — so the gate checks the strongest consistent
    * reading: the earliest damage must follow the latest installation
    * (divergence documented). Returns the frame with the date column
    * parsed. */
  def vmsInstalls(v0: DataFrame): DataFrame = {
    val v = v0.withColumn("device_event_date", to_date(col("device_event_date")))
    val bad = v.groupBy(col("device_imei"))
      .agg(
        max(when(col("device_event_type") === "installation",
          col("device_event_date"))).as("__install"),
        min(when(col("device_event_type") === "damage recorded",
          col("device_event_date"))).as("__damage"))
      .filter(col("__damage").isNotNull && col("__install").isNotNull &&
        col("__damage") <= col("__install"))
      .count()
    if (bad > 0) fail("vms_installs", bad, "devices with damage recorded prior to installation")
    v
  }

  /** `pt_validate_devices` (`:157-160`): imei stored as string; no
    * further checks in the reference. */
  def devices(d: DataFrame): DataFrame =
    d.withColumn("device_imei", col("device_imei").cast("string"))

  /** `pt_validate_flags` (`:174-190`): drop message-less rows, ids as
    * string, every flag has an id, ids unique. */
  def flags(f0: DataFrame): DataFrame = {
    val f = f0.filter(col("flag_message").isNotNull)
      .withColumn("flag_id", col("flag_id").cast("string"))
    val r = f.agg(
      count(lit(1)).as("n"),
      count(col("flag_id")).as("n_with_id"),
      countDistinct(col("flag_id")).as("n_codes")).head()
    val (n, nId, nCodes) = (r.getLong(0), r.getLong(1), r.getLong(2))
    if (nId < n) fail("flags", n - nId, "flags without a flag_id")
    if (nCodes < n) fail("flags", n - nCodes, "duplicated flag_id values")
    f
  }

  /** `pt_validate_boats` (`:201-229`): timestamp parse (`ymd_hm`) and
    * recorded lengths strictly inside (0, 30) metres. */
  def boats(b0: DataFrame): DataFrame = {
    val b = b0.withColumn("last_modified_time",
      to_timestamp(col("last_modified_time"), "yyyy-MM-dd HH:mm"))
    val bad = b.filter(col("boat_length").isNotNull &&
      !(col("boat_length") > 0.0 && col("boat_length") < 30.0)).count()
    if (bad > 0) fail("boats", bad, "boats with invalid lengths")
    b
  }
}
