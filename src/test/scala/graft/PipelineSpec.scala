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

  test("estimation rollup: current month prorated, future months dropped, sub-month grains empty") {
    val preds = Seq(
      ("2024-01-01", 10.0, 100.0, 30.0, 300.0, 3000.0, 5.0),
      ("2024-02-01", 20.0, 200.0, 29.0, 290.0, 2900.0, 6.0), // current (today Feb 15)
      ("2024-03-01", 30.0, 300.0, 31.0, 310.0, 3100.0, 7.0)  // future -> dropped
    ).toDF("landing_period", "landing_catch_price", "landing_catch",
        "n_landings_per_boat", "catch_price", "catch", "price_kg")
      .withColumn("landing_period", to_date($"landing_period"))
    val today = "2024-02-15"
    val m = PublicData.summariseEstimations(preds, "month", today).cache()
    // Jan + the 13 completed spine months with elapsed > 0 (Feb); future months gone
    assert(m.filter($"date_bin_start" === "2024-03-01").count() == 0)
    val feb = m.filter($"date_bin_start" === "2024-02-01").head()
    // Feb proration: elapsed 15 days of 29 (2024 is a leap year)
    assert(math.abs(feb.getAs[Double]("catch") - 2900.0 * 15 / 29) < 1e-9)
    assert(math.abs(feb.getAs[Double]("n_landings_per_boat") - 29.0 * 15 / 29) < 1e-9)
    // per-landing means are NOT prorated
    assert(feb.getAs[Double]("landing_catch") == 200.0)
    val yr = PublicData.summariseEstimations(preds, "year", today)
      .filter($"date_bin_start" === "2024-01-01").head()
    assert(math.abs(yr.getAs[Double]("catch") - (3000.0 + 2900.0 * 15 / 29)) < 1e-9)
    assert(PublicData.summariseEstimations(preds, "week", today).count() == 0)
    assert(PublicData.summariseEstimations(preds, "day", today).count() == 0)
  }

  test("municipal split: recorded zeros become nulls, model rows survive the join") {
    val landings = Seq(
      (1L, "Dili", "2024-01-03", 10.0, 2.0),
      (2L, "Dili", "2024-01-20", 20.0, 0.0),
      (3L, "Baucau", "2024-01-05", 0.0, 0.0) // all-zero group -> nulls
    ).toDF("landing_id", "municipality", "landing_date", "catch_price", "fuel")
      .withColumn("landing_date", to_date($"landing_date"))
    val catchRows = Seq((1L, 500.0), (2L, 1500.0)).toDF("landing_id", "catch")
    val models = Seq(
      ("Dili", "2024-01-01", 7.0), ("Baucau", "2024-01-01", 8.0),
      ("Viqueque", "2024-01-01", 9.0) // no recorded rows -> nulls carried
    ).toDF("municipality", "landing_period", "catch")
      .withColumn("landing_period", to_date($"landing_period"))
    val out = PublicData.municipalAggregated(models,
      PublicData.municipalRecorded(landings, catchRows)).cache()
    assert(out.count() == 3)
    val dili = out.filter($"municipality" === "Dili").head()
    assert(dili.getAs[Double]("recorded_catch_price") == 30.0)
    assert(dili.getAs[Double]("recorded_catch") == 2.0) // 2000 g -> tonnes
    assert(dili.getAs[Double]("fuel") == 1.0)           // mean(2, 0)
    val baucau = out.filter($"municipality" === "Baucau").head()
    assert(baucau.getAs[Any]("recorded_catch_price") == null) // 0 -> NA
    assert(baucau.getAs[Any]("recorded_catch") == null)
    assert(baucau.getAs[Any]("fuel") == null)
    assert(out.filter($"municipality" === "Viqueque").head().getAs[Any]("fuel") == null)
  }

  test("jsonify indicators: per-habitat series ordered by summed value") {
    val rows = (1 to 60).flatMap { i => Seq(
      ("reef", "net", 10.0), ("reef", "line", 30.0), ("fad", "net", 5.0)
    )} ++ Seq(("deep", "rare", 99.0)) // n=1 -> filtered by minN
    val df = rows.toDF("habitat", "gear", "cpe")
    val out = PublicData.jsonifyIndicators(df, "cpe", minN = 50).collect()
    assert(out.map(_.getAs[String]("name")).toSeq == Seq("reef", "fad"))
    val reef = out.head.getAs[String]("data")
    assert(reef.contains("\"x\":\"line\"") && reef.indexOf("line") < reef.indexOf("net"))
  }
}
