package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamNovelty

case class NovDoc(doc_id: Long, text: String)

/** Streaming novelty gate: cross-batch index growth, duplicate
  * rejection, short-doc policy, replay idempotency. */
class StreamNoveltySpec extends SparkSpec {
  import spark.implicits._

  private def roots(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("streamnov").toString
    (s"$base/index", s"$base/corpus")
  }

  test("later batches are gated by earlier batches' landed content; index grows with accepted docs only") {
    val (idx, corp) = roots()
    implicit val sql = spark.sqlContext
    val input = MemoryStream[NovDoc]
    val q = input.toDF().writeStream
      .foreachBatch(StreamNovelty.noveltyGate("doc_id", "text", k = 3,
        minNovelty = 0.5, indexRoot = idx, corpusRoot = corp))
      .outputMode("append").start()
    try {
      input.addData(NovDoc(1L, "a b c d e f"))
      q.processAllAvailable()
      // batch 2: an exact duplicate of landed doc 1 (novelty 0 → drop),
      // fresh prose (novelty 1 → keep), and a short doc (kept by policy)
      input.addData(NovDoc(2L, "a b c d e f"), NovDoc(3L, "p q r s t u"),
        NovDoc(4L, "x y"))
      q.processAllAvailable()
      val landedIds = spark.read.parquet(corp).select("doc_id")
        .as[Long].collect().toSet
      assert(landedIds == Set(1L, 3L, 4L))
      // the index holds shingles of accepted docs only (docs 1 and 3 —
      // doc 4 is unshingleable): 4 + 4 distinct shingles
      assert(StreamNovelty.landedIndex(spark, idx).count() == 8)
    } finally q.stop()
  }

  test("keepShort=false drops unshingleable docs; replayed batch is a no-op") {
    val (idx, corp) = roots()
    val b0 = Seq(NovDoc(1L, "a b c d e f"), NovDoc(2L, "x y")).toDF()
    val gate = StreamNovelty.noveltyGate("doc_id", "text", 3, 0.5, idx, corp,
      keepShort = false)
    gate(b0, 0L)
    assert(spark.read.parquet(corp).select("doc_id").as[Long].collect().toSet == Set(1L))
    // crash-replay of the same batchId: committed marker → no-op, no dup rows
    gate(b0, 0L)
    assert(spark.read.parquet(corp).count() == 1)
    // next batch still sees batch-0 content as landed
    gate(Seq(NovDoc(3L, "a b c d e f")).toDF(), 1L)
    assert(spark.read.parquet(corp).select("doc_id").as[Long].collect().toSet == Set(1L))
  }
}
