package graft

import graft.streaming.Sessionize
import graft.streaming.Sessionize.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("batch sessionization splits on gaps and emits trailing sessions") {
    val ev = Seq(
      Event(1L, ts("2024-01-01 10:00:00"), 1.0),
      Event(1L, ts("2024-01-01 10:10:00"), 2.0),  // same session (gap 10m < 30m)
      Event(1L, ts("2024-01-01 12:00:00"), 3.0),  // new session
      Event(2L, ts("2024-01-01 09:00:00"), 5.0)
    ).toDS()
    val out = Sessionize.sessions(ev, gapSeconds = 1800, streaming = false)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(out.length == 3)
    assert(out(0).n_events == 2 && out(0).sum_value == 3.0)
    assert(out(0).session_end == ts("2024-01-01 10:10:00"))
    assert(out(1).n_events == 1 && out(1).sum_value == 3.0)
    assert(out(2).user_id == 2L)
  }

  test("streaming sessionization holds open sessions across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessions(
      input.toDS().withWatermark("ts", "0 seconds").as[Event],
      gapSeconds = 1800, streaming = true)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      // batch 1: two events of one session — nothing closes yet
      input.addData(
        Event(1L, ts("2024-01-01 10:00:00"), 1.0),
        Event(1L, ts("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0)
      // batch 2: an event far past the gap → watermark advances past the
      // open session's timeout, closing it; the new event opens another
      input.addData(Event(1L, ts("2024-01-01 12:00:00"), 3.0))
      q.processAllAvailable()
      // one more batch so the timeout fires after the watermark moved
      input.addData(Event(1L, ts("2024-01-01 13:00:00"), 4.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[Sessionize.Session].collect()
      assert(closed.exists(s => s.n_events == 2 && s.sum_value == 3.0),
        s"first session should have closed with both events: ${closed.mkString(", ")}")
    } finally q.stop()
  }
}
