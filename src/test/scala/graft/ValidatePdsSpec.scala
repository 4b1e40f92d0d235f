package graft

import graft.pipeline.ValidatePdsTrips
import org.apache.spark.sql.functions._

/** Unit surface for the PDS-trip validation entry point
  * (`R/validate-pds-trips.R:17-205`, `R/preprocess-pds-trips.R:101-145`);
  * the composed descriptors+validators path is oracle-gated by q82. */
class ValidatePdsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("prepare: dedupes to the largest trip id, filters stale trackers, leads per boat") {
    val trips = Seq(
      // boat A: trips 1 and 5 are byte-identical apart from the id -> keep 5
      (1L, "A", "2024-01-01 06:00:00", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
      (5L, "A", "2024-01-01 06:00:00", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
      (6L, "A", "2024-01-02 06:00:00", "2024-01-02 09:00:00", "2024-01-02 10:00:00"),
      // boat B: last_seen BEFORE ended -> dropped
      (7L, "B", "2024-01-01 06:00:00", "2024-01-01 10:00:00", "2024-01-01 09:00:00")
    ).toDF("trip", "boat", "started", "ended", "last_seen")
      .withColumn("started", to_timestamp($"started"))
      .withColumn("ended", to_timestamp($"ended"))
      .withColumn("last_seen", to_timestamp($"last_seen"))
    val out = ValidatePdsTrips.prepare(trips)
    val rows = out.select($"trip", $"end_start_time").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows.keySet == Set(5L, 6L))
    // trip 5 ends 10:00, trip 6 starts next day 06:00 -> 1200 minutes
    assert(rows(5L).contains(1200.0))
    assert(rows(6L).isEmpty) // no next trip
  }

  test("trackDescriptors: firsts/lasts, outlier %, exact sample sd of gaps") {
    val pts = Seq(
      // trip t1: times 0, 60, 180 -> gaps 60, 120 -> sd = 42.426...
      ("t1", 1000L, -8.55, 125.57, 10.0, 1L),
      ("t1", 1060L, -8.60, 125.60, 35.0, 2L),
      ("t1", 1180L, -8.70, 126.00, 20.0, 3L),
      // trip t2: single point -> null dispersion, 0 distance
      ("t2", 2000L, -8.50, 125.50, 50.0, 4L)
    ).toDF("trip", "tsec", "lat", "lng", "speed_ms", "ord")
    val out = ValidatePdsTrips.trackDescriptors(pts, "ord").collect()
      .map(r => r.getString(0) -> r).toMap
    val t1 = out("t1")
    assert(t1.getAs[Double]("start_lat") == -8.55 && t1.getAs[Double]("end_lng") == 126.00)
    // 1 of 3 points over 30 m/s
    assert(math.abs(t1.getAs[Double]("outliers_proportion") - 100.0 / 3.0) < 1e-12)
    // sample sd of (60, 120) = |120-60|/sqrt(2) = 42.4264...
    assert(math.abs(t1.getAs[Double]("timetrace_dispersion") - 60.0 / math.sqrt(2.0)) < 1e-9)
    assert(t1.getAs[Double]("start_end_distance") > 0.0)
    val t2 = out("t2")
    assert(t2.isNullAt(t2.fieldIndex("timetrace_dispersion")))
    assert(t2.getAs[Double]("start_end_distance") == 0.0)
  }

  test("validated: alert ladder cleans the reference's columns; one-way arm stays dead") {
    val trips = Seq(
      // trip, duration_s, distance_m, outp, disp  (se distance huge: would
      // trip the one-way arm if it were live)
      ("ok", 7200.0, 5000.0, 5.0, 100.0),
      ("long", 600000.0, 5000.0, 5.0, 100.0), // alert 8
      ("far", 7200.0, 200000.0, 5.0, 100.0),  // alert 9
      ("noisy", 7200.0, 5000.0, 90.0, 100.0)  // alert 13
    ).toDF("trip", "duration_s", "distance_m", "outliers_proportion", "timetrace_dispersion")
      .withColumn("started", to_timestamp(lit("2024-01-01 06:00:00")))
      .withColumn("ended", to_timestamp(lit("2024-01-01 08:00:00")))
      .withColumn("start_end_distance", lit(999999.0))
    val out = ValidatePdsTrips.validated(trips).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.values.forall(r => r.isNullAt(r.fieldIndex("alert_one_way"))))
    val long = out("long")
    assert(long.getAs[Integer]("alert_duration") == 8)
    assert(long.isNullAt(long.fieldIndex("tracker_trip_duration")))
    assert(long.isNullAt(long.fieldIndex("tracker_trip_start")))
    val far = out("far")
    assert(far.getAs[Integer]("alert_distance") == 9)
    assert(far.isNullAt(far.fieldIndex("tracker_trip_distance")))
    // 9 does NOT clean duration/start/end
    assert(!far.isNullAt(far.fieldIndex("tracker_trip_duration")))
    val ok = out("ok")
    assert(Seq("alert_duration", "alert_distance", "alert_quality")
      .forall(c => ok.isNullAt(ok.fieldIndex(c))))
  }
}
