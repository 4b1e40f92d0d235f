package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class DedupRec(id: Long, ts: java.sql.Timestamp, v: Double)

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private type Rec = DedupRec
  private def Rec(id: Long, ts: java.sql.Timestamp, v: Double) = DedupRec(id, ts, v)

  test("streaming exactOnce emits each key once across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Rec]
    val q = StreamDedup.exactOnce(input.toDF(), Seq("id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_exact").start()
    try {
      input.addData(Rec(1, ts("2024-01-01 10:00:00"), 1.0),
        Rec(2, ts("2024-01-01 10:00:01"), 2.0))
      q.processAllAvailable()
      input.addData(Rec(1, ts("2024-01-01 10:05:00"), 99.0), // dup, later batch
        Rec(3, ts("2024-01-01 10:05:01"), 3.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_exact").as[Rec].collect().sortBy(_.id)
      assert(rows.map(_.id).toSeq == Seq(1L, 2L, 3L))
      assert(rows.head.v == 1.0, "first occurrence wins")
    } finally q.stop()
  }

  test("withinWatermark drops duplicates arriving inside the delay window") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Rec]
    val q = StreamDedup.withinWatermark(
        input.toDF(), Seq("id"), "ts", delay = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_wm").start()
    try {
      input.addData(Rec(7, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      input.addData(Rec(7, ts("2024-01-01 10:03:00"), 2.0)) // dup within window
      q.processAllAvailable()
      assert(spark.table("dedup_wm").count() == 1)
    } finally q.stop()
  }

  test("batch mode: same operator, plain first-per-key semantics") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:05:00"), 2.0),
      (2L, ts("2024-01-01 11:00:00"), 3.0)).toDF("id", "ts", "v")
    assert(StreamDedup.withinWatermark(df, Seq("id"), "ts", "10 minutes").count() == 2)
    val firsts = StreamDedup.batchFirstPerKey(df, Seq("id"), "ts", Seq("v"))
      .select($"id", $"v").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(firsts == Map(1L -> 1.0, 2L -> 3.0))
  }
}
