package graft

import graft.pipeline.{Export, MergeTrips, PublicData, ValidateLandings}
import org.apache.spark.sql.functions._

/** The reference's live DAG driven end-to-end through one chained plan:
  * validate_landings → merge_trips → format_public_data → export
  * (SURVEY §0's pipeline order), over FIXTURES-shaped frames. Each
  * stage is oracle/spec-gated on its own; this suite pins that the
  * STAGES COMPOSE — schemas line up, ids survive, gates hold — the way
  * a user of the reference would actually run them. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def landings = Seq(
    // submission_id, date, submitted, imei, gear, hrs, value, kg
    (1L, "2024-03-01", "2024-03-02 10:00:00", "54567", "GN", 5.0, 25.0, 10.0),
    (2L, "2024-03-01", "2024-03-02 10:00:00", "54567", "GN", 120.0, 30.0, 12.0), // duration alert
    (3L, "2024-03-02", "2024-03-03 10:00:00", "54567", "GN", 6.0, 20.0, 8.0),
    (4L, "2024-03-02", "2024-03-03 10:00:00", "11111", "GN", 7.0, 22.0, 9.0)
  ).toDF("submission_id", "landing_date", "submission_time", "imei",
      "gear_code", "duration_hrs", "total_catch_value", "weight_kg")
    .withColumn("landing_date", to_date($"landing_date"))
    .withColumn("submission_time", to_timestamp($"submission_time"))

  private def registry = Seq("123454567", "888881111x").toDF("device_imei")
  private def gearDim = Seq("GN", "HL").toDF("gear_code")

  private def pdsTrips = Seq(
    (100L, "2024-03-01 08:30:00", "123454567"),
    (101L, "2024-03-02 09:15:00", "123454567")
  ).toDF("tracker_trip_id", "ended", "imei")
    .withColumn("ended", to_timestamp($"ended"))

  test("validate → merge → public trips → export compose end-to-end") {
    // 1. validate (compact fold; alerts + cleaned values + resolved imei)
    val validated = ValidateLandings(landings, registry, gearDim)
    assert(validated.count() == 4)

    // 2. merge with GPS trips on (landing_date, imei): resolved imeis
    // match the tracker's full imei
    val forMerge = validated
      .withColumnRenamed("submission_id", "landing_id")
      .withColumn("imei", coalesce($"imei_resolved", $"imei"))
    val merged = MergeTrips(forMerge, pdsTrips)
    assert(MergeTrips.gate(merged), "merge gate: both ids unique")
    val matched = merged.filter($"landing_id".isNotNull && $"tracker_trip_id".isNotNull)
    // landings 1-3 resolve to 123454567; days 03-01 (two landings -> ambiguous,
    // refused) and 03-02 (unique landing 3 matches trip 101)
    assert(matched.select($"landing_id").as[Long].collect().toSet == Set(3L))

    // 3. public trips: anonymized id, recorded-activity rollup
    val publicTrips = PublicData.withTripId(merged)
      .withColumn("catch_price", $"total_catch_value")
    assert(PublicData.gate(publicTrips), "public gate: trip_id unique")
    val monthly = PublicData.summariseTrips(
      publicTrips.filter($"landing_date".isNotNull), "month")
    val m = monthly.head()
    // 4 landings; BOTH tracker trips appear (the unmatched one rides the
    // full-outer merge with its own end-date, exactly as in the reference)
    assert(m.getAs[Long]("n_landings") == 4L && m.getAs[Long]("n_tracks") == 2L)

    // 4. export: ontology renames + period labels
    val exported = Export.aggregatedLabels(
      Export.renameOntology(monthly.withColumnRenamed("period_start", "date_bin_start")),
      "month", nBoats = Some(10L))
    val cols = exported.columns.toSet
    assert(cols.contains("catch_value") && cols.contains("month") &&
      cols.contains("year") && cols.contains("n_boats"))
    assert(exported.head().getAs[String]("month") == "March 2024")
  }
}
