package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamHistogram

case class HistRow(a: Double, b: Double)

/** Streaming equi-width histogram against FROZEN edges: in-range
  * counts equal the batch bucketing exactly (additive aggregate),
  * out-of-range arrivals clamp into the end buckets (the drift
  * signal), and the stream-static edges join broadcasts. */
class StreamHistogramSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    ("a", 0L, 1000L),   // e2 range: values 0.00 .. 10.00
    ("b", -500L, 500L)
  ).toDF("col_name", "min_e2", "max_e2")

  private def batchCounts(rows: Seq[HistRow]): Map[(String, Long), Long] =
    StreamHistogram.counts(rows.toDF(), Seq("a", "b"), edges)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("stream counts over two batches equal one batch pass (additive, exact)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[HistRow]
    val q = StreamHistogram.counts(in.toDF(), Seq("a", "b"), edges)
      .writeStream.format("memory").queryName("shist1")
      .outputMode("complete").start()
    val b1 = (1 to 300).map(i => HistRow((i % 100) / 10.0, ((i * 7) % 100 - 50) / 10.0))
    val b2 = (1 to 200).map(i => HistRow(((i * 3) % 100) / 10.0, ((i * 11) % 100 - 50) / 10.0))
    try {
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("shist1").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == batchCounts(b1 ++ b2))
  }

  test("out-of-range arrivals clamp to the end buckets, never drop") {
    val rows = Seq(HistRow(-99.0, 0.0), HistRow(999.0, 0.0), HistRow(5.0, 99.0))
    val got = batchCounts(rows)
    assert(got(("a", 0L)) == 1L)   // -99 clamps low
    assert(got(("a", 15L)) == 1L)  // 999 clamps high
    assert(got(("b", 15L)) == 1L)  // 99 clamps high
    assert(got.values.sum == rows.size * 2) // every value lands somewhere
  }

  test("the frozen-edge join broadcasts (stream side never shuffles for it)") {
    val plan = StreamHistogram.counts(
      Seq(HistRow(1.0, 1.0)).toDF(), Seq("a", "b"), edges)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
  }
}
