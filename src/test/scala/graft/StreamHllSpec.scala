package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.HllSketch
import graft.streaming.StreamHll

case class HllKey(key: String)

/** Streaming HLL: the sharded stream registers max-merge into exactly
  * the registers one batch `hll_registers` pass over the full history
  * produces (partial-sketch identity), the merged estimate matches the
  * batch estimate bit-for-bit, and a replayed batch is a register
  * no-op (idempotence under at-least-once delivery). */
class StreamHllSpec extends SparkSpec {
  import spark.implicits._

  private val P = 9
  private val Shards = 4
  private val Tag = "shllspec"

  private def batchRegisters(keys: Seq[String]): Seq[Int] = {
    HllSketch.register(spark)
    keys.toDF("k")
      .select(HllSketch.hash60(col("k"), Tag).as("h"))
      .agg(expr(s"hll_registers(h, $P)"))
      .collect()(0).getSeq[Int](0)
  }

  private def mergeRows(rows: Array[org.apache.spark.sql.Row]): Seq[Int] = {
    // latest emission per shard, then elementwise max
    val latest = rows.zipWithIndex
      .groupBy(_._1.getAs[Int]("shard"))
      .map { case (_, rs) => rs.maxBy(_._2)._1.getSeq[Int](rs.head._1.fieldIndex("registers")) }
    latest.reduce((a, b) => a.zip(b).map { case (x, y) => math.max(x, y) })
  }

  test("stream shard registers max-merge into the batch registers; estimates equal") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[HllKey]
    val out = StreamHll.registers(in.toDF(), "key", Shards, P, Tag)
      .writeStream.format("memory").queryName("shll")
      .outputMode("update").start()
    val b1 = (0 until 800).map(i => HllKey(s"u-${i % 500}"))
    val b2 = (0 until 600).map(i => HllKey(s"u-${300 + i}")) // 200 overlap, 400 new
    try {
      in.addData(b1); out.processAllAvailable()
      in.addData(b2); out.processAllAvailable()
    } finally out.stop()
    val emitted = spark.table("shll").collect()
    val streamRegs = mergeRows(emitted)
    val wantRegs = batchRegisters((b1 ++ b2).map(_.key))
    assert(streamRegs == wantRegs,
      "merged stream registers must equal the one-pass batch registers")

    // and the merged estimate equals the batch-side estimate computation
    val latestPerShard = emitted.zipWithIndex
      .groupBy(_._1.getAs[Int]("shard"))
      .map { case (_, rs) => rs.maxBy(_._2)._1 }.toSeq
    val latestDf = spark.createDataFrame(
      spark.sparkContext.parallelize(latestPerShard),
      emitted.head.schema)
    val streamEst = StreamHll.mergedEstimate(latestDf, P)
      .collect()(0).getAs[Double]("estimate")
    val batchEst = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(0, 0L, wantRegs))),
        latestDf.schema)
      .transform(StreamHll.mergedEstimate(_, P))
      .collect()(0).getAs[Double]("estimate")
    assert(streamEst == batchEst)
    // sanity: ~900 distinct keys, p=9 → ~4.6% se; allow 4 se
    assert(math.abs(streamEst - 900.0) / 900.0 < 4 * 1.04 / math.sqrt(512.0),
      s"estimate $streamEst far from 900")
  }

  test("replaying a batch is a register no-op (idempotent under at-least-once)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[HllKey]
    val out = StreamHll.registers(in.toDF(), "key", Shards, P, Tag)
      .writeStream.format("memory").queryName("shll2")
      .outputMode("update").start()
    val b = (0 until 300).map(i => HllKey(s"r-$i"))
    try {
      in.addData(b); out.processAllAvailable()
      in.addData(b); out.processAllAvailable() // the replay
    } finally out.stop()
    val emitted = spark.table("shll2").collect()
    assert(mergeRows(emitted) == batchRegisters(b.map(_.key)),
      "replay must not move any register")
  }
}
