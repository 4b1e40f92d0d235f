package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.graph.PageRank
import graft.streaming.StreamGraph

case class EdgeEvt(src: String, dst: String, w: Long)

/** Streaming rank maintenance: storage-resident rank state, warm-start
  * chain across micro-batches, replay idempotency. */
class StreamGraphSpec extends SparkSpec {
  import spark.implicits._

  private def roots(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("streamgraph").toString
    (s"$base/edges", s"$base/ranks")
  }

  private val b1 = Seq(EdgeEvt("a", "b", 1L), EdgeEvt("b", "c", 1L), EdgeEvt("c", "a", 1L))
  private val b2 = Seq(EdgeEvt("a", "d", 2L), EdgeEvt("d", "a", 1L))

  test("ranks chain warm-start across micro-batches and match the batch replay") {
    val (er, rr) = roots()
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EdgeEvt]
    val q = input.toDF().writeStream
      .foreachBatch(StreamGraph.rankMaintenance(er, rr, warmRounds = 1))
      .outputMode("append").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val (latest, ranksDf) = StreamGraph.latestRanks(spark, rr).get
    assert(latest == 1L)
    val got = ranksDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch replay of the same chain: 1 uniform round on b1's edges,
    // then 1 warm round over b1 ∪ b2
    val r0 = PageRank.run(b1.toDF("src", "dst", "w"), 1)
    val want = PageRank.continueFrom((b1 ++ b2).toDF("src", "dst", "w"), r0, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.keySet == Set("a", "b", "c", "d"))
  }

  test("a replayed batchId is a no-op: committed ranks are not rewritten") {
    val (er, rr) = roots()
    val edges = b1.toDF("src", "dst", "w")
    val handler = StreamGraph.rankMaintenance(er, rr, warmRounds = 1)
    handler(edges, 0L)
    val before = StreamGraph.latestRanks(spark, rr).get._2.collect().toSet
    // replay with DIFFERENT content — committed state must win
    handler(b2.toDF("src", "dst", "w"), 0L)
    val after = StreamGraph.latestRanks(spark, rr).get._2.collect().toSet
    assert(before == after)
  }
}
