package graft

import graft.pipeline.MergeTrips
import graft.streaming.MergeTripsStreaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class LandingEvt(landing_id: Long, landing_ts: java.sql.Timestamp, imei: String)
case class TripEvt(tracker_trip_id: Long, ended: java.sql.Timestamp, imei: String)

/** Batch ≡ stream for the merge-trips match (VERDICT r2 item 10). */
class MergeTripsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // one landing and one preceding same-day trip end per (date, imei) —
  // the regime where the batch unique-day rule matches; plus an
  // ambiguous day (two trips for imei 3) where batch refuses and the
  // stream picks the latest
  private val landings = Seq(
    LandingEvt(10L, ts("2024-03-01 18:00:00"), "111"),
    LandingEvt(11L, ts("2024-03-02 19:00:00"), "111"),
    LandingEvt(12L, ts("2024-03-01 17:30:00"), "222"),
    LandingEvt(13L, ts("2024-03-01 18:30:00"), "333"))
  private val trips = Seq(
    TripEvt(20L, ts("2024-03-01 17:10:00"), "111"),
    TripEvt(21L, ts("2024-03-02 17:20:00"), "111"),
    TripEvt(22L, ts("2024-03-01 16:40:00"), "222"),
    TripEvt(23L, ts("2024-03-01 15:00:00"), "333"),
    TripEvt(24L, ts("2024-03-01 16:00:00"), "333")) // later -> as-of winner

  private def matchedPairs(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.filter($"tracker_trip_id".isNotNull && $"landing_id".isNotNull)
      .select($"landing_id", $"tracker_trip_id")
      .as[(Long, Long)].collect().toMap

  test("streaming merge equals the batch operator where unique-day matching applies") {
    val batchAsOf = matchedPairs(MergeTripsStreaming.merge(
      landings.toDF(), trips.toDF(), lookbackSeconds = 6 * 3600))
    // the day-grain batch merge on the same data (unique (date, imei) rows)
    val batchDay = matchedPairs(MergeTrips(
      landings.toDF().withColumn("landing_date", to_date($"landing_ts")),
      trips.toDF()))
    // imeis 111/222: both rules match identically
    Seq(10L -> 20L, 11L -> 21L, 12L -> 22L).foreach { case (l, t) =>
      assert(batchAsOf.get(l).contains(t), s"as-of: $l -> $batchAsOf")
      assert(batchDay.get(l).contains(t), s"day: $l -> $batchDay")
    }
    // imei 333: two same-day trips — batch refuses (ambiguous), as-of resolves by recency
    assert(batchAsOf.get(13L).contains(24L))
    assert(!batchDay.contains(13L))
  }

  test("stream execution produces the same matches as the batch run of the same operator") {
    implicit val sql = spark.sqlContext
    val ls = MemoryStream[LandingEvt]
    val tr = MemoryStream[TripEvt]
    val q = MergeTripsStreaming.merge(ls.toDF(), tr.toDF(),
        lookbackSeconds = 6 * 3600, watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("mts").start()
    try {
      tr.addData(trips: _*)
      ls.addData(landings: _*)
      q.processAllAvailable()
      // push both watermarks past every landing so the as-of closes
      tr.addData(TripEvt(90L, ts("2024-03-05 00:00:00"), "999"))
      ls.addData(LandingEvt(91L, ts("2024-03-05 01:00:00"), "999"))
      q.processAllAvailable()
      tr.addData(TripEvt(92L, ts("2024-03-07 00:00:00"), "999"))
      ls.addData(LandingEvt(93L, ts("2024-03-07 01:00:00"), "999"))
      q.processAllAvailable()
      val streamed = matchedPairs(spark.table("mts"))
        .view.filterKeys(_ < 90L).toMap
      val batch = matchedPairs(MergeTripsStreaming.merge(
        landings.toDF(), trips.toDF(), lookbackSeconds = 6 * 3600))
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally q.stop()
  }
}
