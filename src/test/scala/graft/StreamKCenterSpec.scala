package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.similarity.KCenter
import graft.streaming.StreamKCenter

case class KcVec(vec_id: Long, embedding: Seq[Float])

/** Streaming k-center by merge-and-reduce: bounded state, adaptation
  * to distribution shift, replay idempotency, and a measured coverage
  * bound against the one-shot Gonzalez baseline. */
class StreamKCenterSpec extends SparkSpec {
  import spark.implicits._

  private def grid(ids: Range, fx: Long => Double, fy: Long => Double) =
    ids.map(i => KcVec(i.toLong, Seq(fx(i.toLong).toFloat, fy(i.toLong).toFloat)))

  private def radius(points: Seq[KcVec], cs: Seq[KCenter.Center]): Long =
    KCenter.assign(points.toDF("vec_id", "embedding"), "vec_id", "embedding", cs)
      .agg(org.apache.spark.sql.functions.max($"d2")).as[Long].collect().head

  test("state stays <= k, adapts to a shifted batch, and covers within 4x of one-shot Gonzalez") {
    val root = java.nio.file.Files.createTempDirectory("skc").toString + "/st"
    implicit val sql = spark.sqlContext
    val b1 = grid(0 until 40, i => (i % 8) / 20.0, i => (i / 8) / 20.0)
    val b2 = grid(100 until 140, i => 0.4 + (i % 8) / 40.0, i => -0.4 + (i % 5) / 40.0)
    val input = MemoryStream[KcVec]
    val q = input.toDF().writeStream
      .foreachBatch(StreamKCenter.maintain("vec_id", "embedding", 6, root))
      .outputMode("append").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      val c1 = StreamKCenter.loadCenters(spark, root, Long.MaxValue)
      assert(c1.length == 6)
      input.addData(b2: _*); q.processAllAvailable()
      val c2 = StreamKCenter.loadCenters(spark, root, Long.MaxValue)
      assert(c2.length == 6)
      // the shifted cluster must be represented
      val all = b1 ++ b2
      val rStream = radius(all, c2)
      val oneShot = KCenter.centers(all.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 6)
      val rBatch = radius(all, oneShot)
      assert(rStream <= 16L * rBatch, // 4x distance = 16x squared
        s"stream radius^2 $rStream vs one-shot $rBatch")
    } finally q.stop()
  }

  test("replayed batchId is a no-op; empty batch keeps the state") {
    val root = java.nio.file.Files.createTempDirectory("skc2").toString + "/st"
    val gate = StreamKCenter.maintain("vec_id", "embedding", 3, root)
    val b = grid(0 until 10, i => i / 10.0, _ => 0.0)
    gate(b.toDF("vec_id", "embedding"), 0L)
    val c0 = StreamKCenter.loadCenters(spark, root, Long.MaxValue)
    gate(b.toDF("vec_id", "embedding"), 0L) // crash replay
    assert(StreamKCenter.loadCenters(spark, root, Long.MaxValue) == c0)
    gate(Seq.empty[KcVec].toDF("vec_id", "embedding"), 1L)
    // empty batch writes nothing; latest committed state is batch 0's
    assert(StreamKCenter.loadCenters(spark, root, Long.MaxValue) == c0)
  }

  test("maintenance is deterministic across input partitioning") {
    def run(parts: Int): Seq[Long] = {
      val root = java.nio.file.Files.createTempDirectory("skc3").toString + "/st"
      val gate = StreamKCenter.maintain("vec_id", "embedding", 4, root)
      val b1 = grid(0 until 30, i => (i * 13 % 30) / 30.0, i => (i * 7 % 30) / 30.0)
      val b2 = grid(50 until 80, i => (i * 11 % 30) / 30.0 + 0.3, i => (i * 5 % 30) / 30.0)
      gate(b1.toDF("vec_id", "embedding").repartition(parts), 0L)
      gate(b2.toDF("vec_id", "embedding").repartition(parts), 1L)
      StreamKCenter.loadCenters(spark, root, Long.MaxValue).map(_.id)
    }
    assert(run(1) == run(16))
  }
}
