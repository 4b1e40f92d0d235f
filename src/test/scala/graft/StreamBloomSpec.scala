package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.BloomBits
import graft.streaming.StreamBloom

case class KeyedDoc(key: String, ts: Long)

class StreamBloomSpec extends SparkSpec {
  import spark.implicits._

  private val Shards = 4
  private val M = 2048
  private val K = 3
  private val Tag = "sb"

  /** Driver-side reference: one filter per shard, keys processed in
    * (batch, ts, key) order — what the operator contract promises. */
  private def reference(batches: Seq[Seq[KeyedDoc]]): Map[(String, Long), Boolean] = {
    def shardOf(key: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bs-$Tag$key".getBytes("UTF-8"))
      (java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString.take(7), 16) % Shards).toInt
    }
    val filters = Array.fill(Shards)(new Array[Long](M / 64))
    val out = scala.collection.mutable.Map[(String, Long), Boolean]()
    for (b <- batches; r <- b.sortBy(r => (r.ts, r.key))) {
      val bits = filters(shardOf(r.key))
      val pos = BloomBits.positionsJvm(r.key, K, M, Tag)
      out((r.key, r.ts)) = pos.forall(p => (bits((p >> 6).toInt) & (1L << (p & 63))) != 0)
      pos.foreach(p => bits((p >> 6).toInt) |= (1L << (p & 63)))
    }
    out.toMap
  }

  private def verdicts(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Boolean] =
    df.select($"key", $"ts", $"maybe_seen").as[(String, Long, Boolean)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap

  test("batch mode: no false negatives, verdicts equal the sharded reference") {
    val rows = (0 until 400).map(i => KeyedDoc(s"k${i % 150}", i.toLong))
    val got = verdicts(StreamBloom.dedup(rows.toDF(), "key", "ts", Shards, M, K, Tag))
    assert(got == reference(Seq(rows)))
    // every repeat of a key already processed must be flagged
    val firstTs = rows.groupBy(_.key).map { case (k, g) => k -> g.map(_.ts).min }
    rows.filter(r => r.ts != firstTs(r.key)).foreach(r =>
      assert(got((r.key, r.ts)), s"false negative on ${r.key}@${r.ts}"))
  }

  test("stream across micro-batches equals the replayed-batch reference") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KeyedDoc]
    val out = StreamBloom.dedup(in.toDF(), "key", "ts", Shards, M, K, Tag)
      .writeStream.format("memory").queryName("sbloom").outputMode("append").start()
    val b1 = (0 until 100).map(i => KeyedDoc(s"a$i", i.toLong))
    val b2 = (0 until 100).map(i => KeyedDoc(s"a${i / 2}", 1000L + i)) // 50 repeats of b1 keys
    try {
      in.addData(b1); out.processAllAvailable()
      in.addData(b2); out.processAllAvailable()
      val got = verdicts(spark.table("sbloom"))
      assert(got == reference(Seq(b1, b2)))
      // cross-batch duplicates survive in state: every b2 key with index
      // < 50 repeats a b1 key and must be flagged
      b2.filter(_.key.drop(1).toInt < 50).foreach(r =>
        assert(got((r.key, r.ts)), s"cross-batch false negative on ${r.key}"))
    } finally out.stop()
  }

  test("state is fixed-size: heavy key volume cannot grow it") {
    // not a perf test — a correctness property of the design: the state
    // value per shard is exactly M/64 longs no matter how many keys
    val rows = (0 until 3000).map(i => KeyedDoc(s"v$i", i.toLong))
    val got = StreamBloom.dedup(rows.toDF(), "key", "ts", Shards, M, K, Tag)
    assert(got.count() == 3000)
    // at this load (3000 keys / 4 shards ≈ 750·3 bits in 2048) FPs exist
    // but the filter still rejects most fresh keys
    val fp = got.filter($"maybe_seen").count()
    assert(fp > 0 && fp < 3000)
  }
}
