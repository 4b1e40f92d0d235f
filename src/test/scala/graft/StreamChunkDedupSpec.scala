package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamChunkDedup

case class ChunkDoc(doc_id: Long, text: String)

/** Streaming chunk-dedup gate: near-version rejection through shared
  * chunks, cross-batch index growth, replay idempotency, and stream ≡
  * sequential batch replay. */
@org.scalatest.tags.Slow
class StreamChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  private def toks(n: Int, tag: String = "w"): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  private def roots(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("streamcdc").toString
    (s"$base/index", s"$base/corpus")
  }

  test("a re-post with an edited head still collides on its body chunks and is dropped") {
    val (idx, corp) = roots()
    implicit val sql = spark.sqlContext
    val input = MemoryStream[ChunkDoc]
    val q = input.toDF().writeStream
      .foreachBatch(StreamChunkDedup.chunkGate("doc_id", "text",
        maxLandedShare = 0.5, indexRoot = idx, corpusRoot = corp))
      .outputMode("append").start()
    try {
      input.addData(ChunkDoc(1L, toks(120)))
      q.processAllAvailable()
      // batch 2: a near-version of doc 1 (new 6-token header, same
      // body -> most token mass lands on shared chunks), fresh prose
      input.addData(
        ChunkDoc(2L, s"${toks(6, "hdr")} ${toks(120)}"),
        ChunkDoc(3L, toks(100, "fresh")))
      q.processAllAvailable()
      val landed = spark.read.parquet(corp).select("doc_id")
        .as[Long].collect().toSet
      assert(landed == Set(1L, 3L), s"landed=$landed")
      // batch 3: a near-version of the ACCEPTED doc 3 is now gated too
      input.addData(ChunkDoc(4L, s"${toks(100, "fresh")} tail1 tail2"))
      q.processAllAvailable()
      assert(!spark.read.parquet(corp).select("doc_id")
        .as[Long].collect().contains(4L))
    } finally q.stop()
  }

  test("replayed batchId is a no-op; rejected docs never extend the index") {
    val (idx, corp) = roots()
    val gate = StreamChunkDedup.chunkGate("doc_id", "text", 0.5, idx, corp)
    gate(Seq(ChunkDoc(1L, toks(80))).toDF(), 0L)
    val n0 = StreamChunkDedup.landedIndex(spark, idx).count()
    gate(Seq(ChunkDoc(1L, toks(80))).toDF(), 0L) // crash-replay
    assert(spark.read.parquet(corp).count() == 1)
    assert(StreamChunkDedup.landedIndex(spark, idx).count() == n0)
    // batch 1: exact duplicate rejected -> index unchanged
    gate(Seq(ChunkDoc(2L, toks(80))).toDF(), 1L)
    assert(StreamChunkDedup.landedIndex(spark, idx).count() == n0)
    assert(spark.read.parquet(corp).select("doc_id").as[Long]
      .collect().toSet == Set(1L))
  }

  test("stream chain equals sequential batch replay of the same gate") {
    val batches = Seq(
      Seq(ChunkDoc(1L, toks(90)), ChunkDoc(2L, toks(60, "b"))),
      Seq(ChunkDoc(3L, toks(90)), ChunkDoc(4L, toks(70, "c"))),
      Seq(ChunkDoc(5L, s"${toks(70, "c")} x1 x2 x3")))
    def runChain(): Set[Long] = {
      val (idx, corp) = roots()
      val gate = StreamChunkDedup.chunkGate("doc_id", "text", 0.5, idx, corp)
      batches.zipWithIndex.foreach { case (b, i) => gate(b.toDF(), i.toLong) }
      spark.read.parquet(corp).select("doc_id").as[Long].collect().toSet
    }
    val (idx2, corp2) = roots()
    implicit val sql = spark.sqlContext
    val input = MemoryStream[ChunkDoc]
    val q = input.toDF().writeStream
      .foreachBatch(StreamChunkDedup.chunkGate("doc_id", "text", 0.5,
        idx2, corp2))
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.read.parquet(corp2).select("doc_id")
        .as[Long].collect().toSet
      assert(streamed == runChain())
    } finally q.stop()
  }
}
