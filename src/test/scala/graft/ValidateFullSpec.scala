package graft

import graft.pipeline.{FlagsSync, ValidateLandings}
import org.apache.spark.sql.functions._

/** The full 15-validator fold (`ValidateLandings.full`) and the
  * flags-sheet sync, under the reference's tinytest-style invariants
  * (`/root/reference/inst/tinytest/test_validated_landings.R:1-70`):
  * each violation earns exactly its alert code, cleaned columns are
  * nulled on alert and non-negative otherwise, and human sheet edits
  * survive the sync round-trip. */
class ValidateFullSpec extends SparkSpec {
  import spark.implicits._

  // One row per alert scenario. Columns:
  // (sid, landing, submitted, imei, dur, tcv, boat, hasBoat, gear,
  //  station, fc, fm, fw, habitat, mesh, meshOther, gleaners, fuel,
  //  conservation, happiness)
  // Sentinel defaults (-1) become mild per-sid variation: a constant
  // column has MAD = 0 and the LocScaleB guard then nulls the bounds
  // (no alert can fire), so the outlier validators need spread.
  private def trip(sid: Long, landing: String, submitted: String,
                   imei: String, dur: Double, tcv: Double,
                   habitat: Int = 1, mesh: String = "2",
                   gleaners: Double = Double.NaN, fuel: Double = Double.NaN,
                   fc: Double = 1.0, fm: Double = Double.NaN, fw: Double = 1.0,
                   station: String = "1") =
    (sid, landing, submitted, imei, dur, tcv, 1L, true, 1L, station,
      fc, if (fm.isNaN) 1.0 + (sid % 3) else fm, fw, habitat, mesh, "3",
      if (gleaners.isNaN) (sid % 4).toDouble else gleaners,
      if (fuel.isNaN) 2.0 + 2.0 * (sid % 4) else fuel, "0", 3)

  private def trips = Seq(
    trip(1L, "2024-03-01", "2024-03-02", "54567", 5.0, 25.0),   // clean
    trip(2L, "2024-03-01", "2024-03-02", "99", 5.0, 25.0),      // imei short -> 1
    trip(3L, "2024-03-01", "2024-03-02", "84567", 5.0, 25.0),   // ambiguous -> 2 (two registry rows share the suffix)
    trip(4L, "2024-03-01", "2024-03-02", "11111", 5.0, 25.0),   // no match -> 3
    trip(5L, "2024-03-05", "2024-03-02", "54567", 5.0, 25.0),   // landing after submission -> 4
    trip(6L, "2024-01-01", "2024-03-02", "54567", 5.0, 25.0),   // > 28 d before -> 10
    trip(7L, "2024-03-01", "2024-03-02", "54567", 120.0, 25.0), // duration -> 5
    trip(8L, "2024-03-01", "2024-03-02", "54567", 5.0, 2000.0), // price cap -> 6
    trip(9L, "2024-03-01", "2024-03-02", "54567", 5.0, 0.0),    // value 0 but catch -> 22
    trip(10L, "2024-03-01", "2024-03-02", "54567", 5.0, 25.0, station = "99"), // unknown station -> 16
    trip(11L, "2024-03-01", "2024-03-02", "54567", 5.0, 25.0, fm = 500.0),     // fisher outlier -> 18
    trip(12L, "2024-03-01", "2024-03-02", "54567", 5.0, 25.0, habitat = 9),    // unknown habitat -> 19
    trip(13L, "2024-03-01", "2024-03-02", "54567", 5.0, 25.0, mesh = "100"),   // 2540 mm -> 20
    trip(14L, "2024-03-01", "2024-03-02", "54567", 5.0, 25.0, gleaners = 900.0), // gleaner outlier -> 21
    trip(15L, "2024-03-01", "2024-03-02", "54567", 5.0, 25.0, fuel = -3.0),    // negative fuel -> 23 (not united)
    trip(16L, "2024-03-01", "2024-03-02", "54567", 5.0, 0.02)   // price/kg below floor -> 17
  ).toDF("submission_id", "landing_date", "submission_date", "imei",
      "duration_hrs", "total_catch_value", "boat_code", "has_boat",
      "gear_code", "station_code", "fisher_child", "fisher_man",
      "fisher_woman", "habitat_code", "mesh_size", "mesh_other",
      "n_gleaners", "fuel", "conservation_code", "happiness")
    .withColumn("landing_date", to_date($"landing_date"))
    .withColumn("submission_date", to_date($"submission_date"))

  // sid 9 (tcv 0) carries catch -> inconsistency 22; others 5 kg per row.
  private def catchRows = Seq(
    (1L, 1L, "5", 2.0, 5000.0), (1L, 2L, "6", 3.0, 5000.0),
    (2L, 1L, "5", 2.0, 5000.0), (3L, 1L, "5", 2.0, 5000.0),
    (4L, 1L, "5", 2.0, 5000.0), (5L, 1L, "5", 2.0, 5000.0),
    (6L, 1L, "5", 2.0, 5000.0), (7L, 1L, "5", 2.0, 5000.0),
    (8L, 1L, "5", 2.0, 5000.0), (9L, 1L, "5", 2.0, 5000.0),
    (10L, 1L, "5", 2.0, 5000.0), (11L, 1L, "5", 2.0, 5000.0),
    (12L, 1L, "5", 2.0, 5000.0), (13L, 1L, "5", 2.0, 5000.0),
    (14L, 1L, "5", 2.0, 5000.0), (15L, 1L, "5", 2.0, 5000.0),
    (16L, 1L, "5", 2.0, 5000.0)
  ).toDF("submission_id", "line_no", "species", "n_individuals", "weight_g")

  private def registry = Seq("123454567", "888884567", "999884567", "777711111x")
    .toDF("device_imei")
  private def vesselDim = Seq((1L, "canoe")).toDF("boat_code", "boat_type")
  private def gearDim = Seq((1L, "gill net")).toDF("gear_code", "gear_id")
  private def stations = Seq(("1", "Dili", 1L)).toDF("station_code", "station_name", "reporting_unit")
  private def reportingUnits = Seq(Tuple1(1L)).toDF("reporting_unit")
  private def habitatDim = Seq(Tuple1(1L), Tuple1(2L)).toDF("habitat_code")
  private def conservationDim = Seq(("0", "none")).toDF("conservation_code", "conservation_place")

  private lazy val out = ValidateLandings.full(trips, catchRows, registry,
    vesselDim, gearDim, stations, reportingUnits, habitatDim,
    conservationDim).cache()

  test("full fold: each violation earns its alert code") {
    val alerts = out.select($"submission_id", $"alert")
      .as[(Long, String)].collect().toMap
    assert(alerts(1L) == "0")
    assert(alerts(2L) == "1")
    assert(alerts(3L) == "2")
    assert(alerts(4L) == "3")
    assert(alerts(5L) == "4")
    assert(alerts(6L) == "10")
    assert(alerts(7L) == "5")
    assert(alerts(8L) == "6")
    assert(alerts(9L) == "22")
    assert(alerts(10L) == "16")
    assert(alerts(11L) == "18")
    assert(alerts(12L) == "19")
    assert(alerts(13L) == "20")
    assert(alerts(14L) == "21")
    assert(alerts(15L) == "0") // fuel alert 23 is cleaned but NOT united (reference parity)
    assert(alerts(16L) == "17")
  }

  test("NULL ordered-first species is neither '0' nor not-'0' (fold = standalone = R)") {
    // R's case_when: an NA species satisfies neither `== "0"` nor
    // `!= "0"`, so a zero-value zero-count trip whose first catch row
    // has NULL species earns NO regularity alert. A two-state species
    // encoding that lumps NULL with "not 0" would fire clause 4
    // ((sp <> '0') AND value <= 0) and mis-flag 22.
    val t2 = trips.unionByName(Seq(
      trip(100L, "2024-03-01", "2024-03-02", "54567", 5.0, 0.0))
      .toDF(trips.columns: _*)
      .withColumn("landing_date", to_date($"landing_date"))
      .withColumn("submission_date", to_date($"submission_date")))
    val c2 = catchRows.unionByName(Seq(
      (100L, 1L, null.asInstanceOf[String], 0.0, 5000.0),
      (100L, 2L, "7", 0.0, 5000.0) // later row; must not override the NULL first pick
    ).toDF("submission_id", "line_no", "species", "n_individuals", "weight_g"))
    val full = ValidateLandings.full(t2, c2, registry, vesselDim, gearDim,
      stations, reportingUnits, habitatDim, conservationDim)
    assert(full.filter($"submission_id" === 100L)
      .head().getAs[String]("alert") == "0")
    val standalone = ValidateLandings.regularityAlerts(c2,
      t2.select($"submission_id", $"total_catch_value"))
      .filter($"submission_id" === 100L).head().getAs[Any]("alert_regularity")
    assert(standalone == null)
  }

  test("tinytest invariants: cleaned columns nulled on alert, never negative") {
    // trip_length: no negatives, nulled on alert 5
    assert(out.filter($"trip_length" < 0).count() == 0)
    assert(out.filter($"submission_id" === 7L).head().getAs[Any]("trip_length") == null)
    // catch_price: nulled on the price-weight ladder (6/22/17), kept clean otherwise
    Seq(8L, 9L, 16L).foreach { s =>
      assert(out.filter($"submission_id" === s).head().getAs[Any]("catch_price") == null)
    }
    assert(out.filter($"submission_id" === 1L).head().getAs[Double]("catch_price") == 25.0)
    assert(out.filter($"catch_price" < 0).count() == 0)
    // fuel: negative cleaned away (sid 15), outliers nulled
    assert(out.filter($"fuel" < 0).count() == 0)
    assert(out.filter($"submission_id" === 15L).head().getAs[Any]("fuel") == null)
    // imei resolved to the full registry id on the unique match
    assert(out.filter($"submission_id" === 1L).head()
      .getAs[String]("imei_resolved") == "123454567")
    // mesh in mm within [0, 500]
    assert(out.filter($"mesh_size_mm" < 0 || $"mesh_size_mm" > 500).count() == 0)
    assert(out.filter($"submission_id" === 13L).head().getAs[Any]("mesh_size_mm") == null)
    // dimension decodes carried
    assert(out.filter($"submission_id" === 1L).head().getAs[String]("vessel_type") == "canoe")
    assert(out.filter($"submission_id" === 1L).head().getAs[String]("habitat_type") == "Reef")
  }

  test("flags sync: new flags appended, human edits preserved, flag_date kept when unchanged") {
    val cur = Seq(
      (1L, "2024-03-02", "2024-04-01", "5", false, null.asInstanceOf[String], null.asInstanceOf[String]),
      (2L, "2024-03-02", "2024-04-01", "7", false, null.asInstanceOf[String], null.asInstanceOf[String]),
      (3L, "2024-03-02", "2024-04-01", "9", false, null.asInstanceOf[String], null.asInstanceOf[String])
    ).toDF("submission_id", "submission_date", "flag_date", "alert",
        "validated", "validated_when_ymd", "comments")
      .withColumn("submission_date", to_date($"submission_date"))
      .withColumn("flag_date", to_date($"flag_date"))
      .withColumn("validated_when_ymd", to_date($"validated_when_ymd"))
    val sheet = Seq(
      (1L, "2024-03-02", "2024-03-05", "5", true, "2024-03-06", "ok"), // unchanged alert, human-validated
      (2L, "2024-03-02", "2024-03-05", "2", false, null.asInstanceOf[String], "checking") // alert changed
    ).toDF("submission_id", "submission_date", "flag_date", "alert",
        "validated", "validated_when_ymd", "comments")
      .withColumn("submission_date", to_date($"submission_date"))
      .withColumn("flag_date", to_date($"flag_date"))
      .withColumn("validated_when_ymd", to_date($"validated_when_ymd"))
    val merged = FlagsSync.sync(cur, sheet).cache()
    assert(merged.count() == 3)
    val r1 = merged.filter($"submission_id" === 1L).head()
    assert(r1.getAs[Boolean]("validated"))               // human edit survives
    assert(r1.getAs[String]("comments") == "ok")
    assert(r1.getAs[java.sql.Date]("flag_date").toString == "2024-03-05") // unchanged alert keeps old date
    val r2 = merged.filter($"submission_id" === 2L).head()
    assert(r2.getAs[String]("alert") == "7")             // machine alert wins
    assert(r2.getAs[java.sql.Date]("flag_date").toString == "2024-04-01") // changed alert refreshes date
    assert(r2.getAs[String]("comments") == "checking")
    val r3 = merged.filter($"submission_id" === 3L).head()
    assert(!r3.getAs[Boolean]("validated"))              // new flag appended as-is
  }

  test("full leaks no cached blocks (entry-point lifecycle contract)") {
    spark.sharedState.cacheManager.clearCache()
    val fresh = ValidateLandings.full(trips, catchRows, registry,
      vesselDim, gearDim, stations, reportingUnits, habitatDim,
      conservationDim)
    fresh.count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "full() must unpersist every intermediate before returning")
  }
}
