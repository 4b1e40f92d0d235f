package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Click(user: Long, click_ts: java.sql.Timestamp, click_v: Double)
case class View(user: Long, view_ts: java.sql.Timestamp, view_v: Double)

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stream-stream interval join pairs clicks with preceding views only") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Click]
    val views = MemoryStream[View]
    val joined = StreamJoin.recentWindowJoin(
      clicks.toDF(), views.toDF(), key = "user",
      leftTs = "click_ts", rightTs = "view_ts",
      lookbackSeconds = 600)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("sj").start()
    try {
      views.addData(
        View(1L, ts("2024-01-01 10:00:00"), 10.0),  // 5 min before the click
        View(1L, ts("2024-01-01 09:40:00"), 11.0),  // 25 min before: outside window
        View(1L, ts("2024-01-01 10:06:00"), 12.0),  // after the click: excluded
        View(2L, ts("2024-01-01 10:01:00"), 13.0))  // other user
      clicks.addData(Click(1L, ts("2024-01-01 10:05:00"), 1.0))
      q.processAllAvailable()
      val got = spark.table("sj")
        .select($"user", $"view_v").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set((1L, 10.0)), got.toString)
    } finally q.stop()
  }

  test("batch frames run the same operator as a plain range join") {
    val clicks = Seq((1L, ts("2024-01-01 10:05:00"), 1.0)).toDF("user", "click_ts", "click_v")
    val views = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 09:40:00"), 11.0)).toDF("user", "view_ts", "view_v")
    val got = StreamJoin.recentWindowJoin(
        clicks, views, "user", "click_ts", "view_ts", 600)
      .select($"view_v").collect().map(_.getDouble(0)).toSet
    assert(got == Set(10.0))
  }

  test("streaming as-of keeps only the latest preceding view per click") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Click]
    val views = MemoryStream[View]
    val joined = StreamJoin.asOfWithin(
      clicks.toDF(), views.toDF(), key = "user",
      leftTs = "click_ts", rightTs = "view_ts",
      rightPayload = Seq("view_v"), lookbackSeconds = 600,
      watermark = "0 seconds")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("sjasof").start()
    try {
      views.addData(
        View(1L, ts("2024-01-01 09:58:00"), 20.0),
        View(1L, ts("2024-01-01 10:00:00"), 10.0)) // later -> wins
      clicks.addData(Click(1L, ts("2024-01-01 10:05:00"), 1.0))
      q.processAllAvailable()
      // advance both watermarks past the click so the aggregate closes
      views.addData(View(1L, ts("2024-01-01 11:00:00"), 99.0))
      clicks.addData(Click(1L, ts("2024-01-01 11:30:00"), 2.0))
      q.processAllAvailable()
      views.addData(View(1L, ts("2024-01-01 12:30:00"), 98.0))
      clicks.addData(Click(1L, ts("2024-01-01 13:00:00"), 3.0))
      q.processAllAvailable()
      val got = spark.table("sjasof")
        .select($"click_ts", $"view_v").collect()
        .map(r => (r.getTimestamp(0), r.getDouble(1))).toMap
      assert(got.get(ts("2024-01-01 10:05:00")).contains(10.0), got.toString)
    } finally q.stop()
  }
}
