package graft

import graft.streaming.StreamChangePoint
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class CpEvent(ts: java.sql.Timestamp, value: Double)

class StreamChangePointSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: Int, v: Double) =
    CpEvent(java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00"), v)

  test("batch ≡ stream: per-day state merged across micro-batches, same change point") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[CpEvent]
    val out = StreamChangePoint.dailyTotals(in.toDF(), "ts", "value")
      .writeStream.format("memory").queryName("scp1")
      .outputMode("update").start()
    // low regime days 1-6, high regime days 7-12; day 3's mass arrives
    // SPLIT across batches (the decimal sum must reassemble exactly)
    val b1 = (1 to 6).map(d => ev(d, 10.25)) :+ ev(3, 0.50)
    val b2 = (7 to 12).map(d => ev(d, 55.75))
    val b3 = Seq(ev(3, 0.25), ev(12, 1.00)) // late updates to both regimes
    try {
      in.addData(b1); out.processAllAvailable()
      in.addData(b2); out.processAllAvailable()
      in.addData(b3); out.processAllAvailable()
    } finally out.stop()
    // latest emission per day = the maintained state
    val rows = spark.table("scp1").collect().zipWithIndex
      .groupBy(_._1.getAs[java.sql.Date]("day"))
      .map { case (_, rs) => rs.maxBy(_._2)._1 }.toSeq
    val latest = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), spark.table("scp1").schema)
    val streamed = StreamChangePoint.changePoint(latest).collect().toSeq

    val batch = StreamChangePoint.changePoint(
      StreamChangePoint.dailyTotals(
        (b1 ++ b2 ++ b3).toDF(), "ts", "value")).collect().toSeq
    assert(streamed == batch, "micro-batch boundaries must be invisible")
    val r: Row = streamed.head
    assert(r.getAs[Long]("i") == 6L, "argmax |cusum| on the last low-regime day")
  }

  test("single-regime stream raises no meaningful shift (score at the tie floor)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[CpEvent]
    val out = StreamChangePoint.dailyTotals(in.toDF(), "ts", "value")
      .writeStream.format("memory").queryName("scp2")
      .outputMode("update").start()
    try {
      in.addData((1 to 8).map(d => ev(d, 20.0))); out.processAllAvailable()
    } finally out.stop()
    val latest = spark.table("scp2")
    val r = StreamChangePoint.changePoint(latest).collect().head
    assert(r.getAs[Double]("score") == 0.0, "constant series → zero CUSUM")
    assert(r.getAs[Long]("i") == 1L, "tie breaks to the earliest day")
  }
}
