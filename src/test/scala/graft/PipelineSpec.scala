package graft

import graft.pipeline.{MergeTrips, PublicData, ValidateLandings}
import org.apache.spark.sql.functions._

/** End-to-end drive of the three reference entry points (SURVEY §3)
  * over FIXTURES.md-shaped data, including the tinytest quality gates. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def landings = Seq(
    // id, date, submitted, imei, gear, hrs, value, kg
    (1L, "2024-03-01", "2024-03-02 10:00:00", "54567", "GN", 5.0, 25.0, 10.0),
    (2L, "2024-03-01", "2024-03-02 10:00:00", "99", "GN", 5.0, 30.0, 12.0),   // short imei -> 5
    (3L, "2024-03-02", "2024-05-01 10:00:00", "54567", "GN", 5.0, 20.0, 8.0),  // late submission -> 2
    (4L, "2024-03-02", "2024-03-03 10:00:00", "54567", "XX", 120.0, 22.0, 9.0),// duration 4 + gear 9
    (5L, "2024-03-03", "2024-03-04 10:00:00", "54567", "GN", 5.0, 4000.0, 11.0), // price/kg 363 -> 17
    (6L, "2024-03-03", "2024-03-04 10:00:00", "11111", "GN", 5.0, 26.0, 10.5), // no registry match -> 7
    (7L, "2024-03-04", "2024-03-05 10:00:00", "54567", "GN", 5.0, 24.0, 500.0), // catch outlier -> 8 (+17: price/kg 0.048)
    (8L, "2024-03-04", "2024-03-05 10:00:00", "54567", "GN", 5.0, 27.0, 11.0)
  ).toDF("submission_id", "landing_date", "submission_time", "imei",
      "gear_code", "duration_hrs", "total_catch_value", "weight_kg")
    .withColumn("landing_date", to_date($"landing_date"))
    .withColumn("submission_time", to_timestamp($"submission_time"))

  private def registry = Seq("123454567", "888884567").toDF("device_imei")
  // "4567" matches BOTH registry entries -> ambiguous alert 6 everywhere
  private def registryUnique = Seq("123454567", "888881111x").toDF("device_imei")
  private def gearDim = Seq("GN", "HL", "SN").toDF("gear_code")

  test("validate_landings: each violation earns its alert code, clean rows validate") {
    val out = ValidateLandings(landings, registryUnique, gearDim)
    val alerts = out.select($"submission_id", $"alert_number")
      .as[(Long, String)].collect().toMap
    assert(alerts(1L) == "")
    assert(alerts(2L) == "5")
    assert(alerts(3L) == "2")
    assert(alerts(4L) == "4-9") // duration + unknown gear
    assert(alerts(5L) == "17")
    assert(alerts(6L) == "7")
    assert(alerts(7L) == "8-17") // MAD catch outlier + price/kg below floor
    val v = out.filter($"validated").count()
    assert(v >= 2)
    // alert-carrying values are nulled (cleaned columns)
    assert(out.filter($"submission_id" === 5L).head().getAs[Any]("total_catch_value") == null)
    assert(out.filter($"submission_id" === 7L).head().getAs[Any]("weight_kg") == null)
  }

  test("merge_trips: unique days match, ambiguous days pass through; gate holds") {
    val l = Seq(
      (10L, "2024-03-01", "111"),
      (11L, "2024-03-02", "111"), // unique
      (12L, "2024-03-03", "111"), // duplicated below
      (13L, "2024-03-03", "111")
    ).toDF("landing_id", "landing_date", "imei")
      .withColumn("landing_date", to_date($"landing_date"))
    val r = Seq(
      (20L, "2024-03-01 17:00:00", "111"),
      (21L, "2024-03-04 17:00:00", "111")
    ).toDF("tracker_trip_id", "ended", "imei")
      .withColumn("ended", to_timestamp($"ended"))
    val merged = MergeTrips(l, r)
    assert(merged.count() == 5) // 1 matched + 1 l-only + 1 r-only + 2 ambiguous
    val matched = merged.filter($"landing_id" === 10L).head()
    assert(matched.getAs[Long]("tracker_trip_id") == 20L)
    assert(MergeTrips.gate(merged))
  }

  test("public data: md5 trip ids with R's NA semantics, unique; 4-grain rollups") {
    val l = Seq(
      (10L, "2024-03-01", "111"),
      (11L, "2024-03-05", "111")
    ).toDF("landing_id", "landing_date", "imei")
      .withColumn("landing_date", to_date($"landing_date"))
      .withColumn("weight_kg", lit(10.0))
      .withColumn("total_catch_value", lit(25.0))
    val r = Seq((20L, "2024-03-01 17:00:00", "111"))
      .toDF("tracker_trip_id", "ended", "imei")
      .withColumn("ended", to_timestamp($"ended"))
    val pub = PublicData.withTripId(MergeTrips(l, r))
    assert(PublicData.gate(pub))
    // R: md5(paste(10, 20)) == md5("10 20"); unmatched: md5("11 NA")
    val ids = pub.select($"trip_id").as[String].collect().toSet
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes).map("%02x".format(_)).mkString
    assert(ids.contains(md5s("10 20")))
    assert(ids.contains(md5s("11 NA")))
    val grains = PublicData.allGrains(pub)
    assert(grains.filter($"grain" === "day").count() == 2)
    assert(grains.filter($"grain" === "year").count() == 1)
    val yr = grains.filter($"grain" === "year").head()
    assert(yr.getAs[Double]("catch_kg") == 20.0)
    assert(yr.getAs[Long]("n_trips") == 2L)
  }
}
