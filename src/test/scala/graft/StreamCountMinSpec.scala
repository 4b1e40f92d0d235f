package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamCountMin

/** Sharded streaming Count-Min occurrence capping: never keeps a key
  * more than `cap` times (the no-undercount direction of the sketch),
  * keeps exactly the first `cap` occurrences when the sketch is
  * collision-free, accumulates across micro-batches, and a batch
  * replay of the same ordered input reproduces every verdict.
  */
class StreamCountMinSpec extends SparkSpec {
  import spark.implicits._

  private val Shards = 4
  private val Depth = 3
  private val Width = 4096
  private val Cap = 3L
  private val Tag = "scm"

  private def run(df: org.apache.spark.sql.DataFrame) =
    StreamCountMin.capOccurrences(df, "key", "ts", Shards, Depth, Width, Cap, Tag)

  private def collect(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Boolean)] =
    df.select($"key", $"ts", $"occ_before", $"kept")
      .as[(String, Long, Long, Boolean)].collect().toSeq.sortBy(t => (t._1, t._2))

  test("batch mode: first cap occurrences kept, the rest dropped (wide sketch, no collisions)") {
    // keys with 1, 3, and 7 occurrences
    val rows = (Seq.fill(1)("once") ++ Seq.fill(3)("thrice") ++ Seq.fill(7)("many"))
      .zipWithIndex.map { case (k, i) => KeyedDoc(k, i.toLong) }
    val got = collect(run(rows.toDF()))
    val keptPerKey = got.filter(_._4).groupBy(_._1).view.mapValues(_.size).toMap
    assert(keptPerKey == Map("once" -> 1, "thrice" -> 3, "many" -> 3), s"$keptPerKey")
    // occ_before counts KEPT occurrences and is exact here
    assert(got.filter(_._1 == "many").map(_._3) == Seq(0L, 1L, 2L, 3L, 3L, 3L, 3L))
  }

  test("hard cap guarantee holds for every key even with a tiny (collision-heavy) sketch") {
    val rows = (0 until 1200).map(i => KeyedDoc(s"k${i % 60}", i.toLong))
    val got = collect(StreamCountMin.capOccurrences(
      rows.toDF(), "key", "ts", Shards, 2, 8, Cap, Tag))
    got.groupBy(_._1).foreach { case (k, g) =>
      assert(g.count(_._4) <= Cap, s"key $k kept more than cap")
    }
  }

  test("stream across micro-batches accumulates state and equals the batch replay") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KeyedDoc]
    val out = run(in.toDF())
      .writeStream.format("memory").queryName("scmq").outputMode("append").start()
    val b1 = (0 until 90).map(i => KeyedDoc(s"d${i % 30}", i.toLong))          // 3 each
    val b2 = (0 until 60).map(i => KeyedDoc(s"d${i % 30}", 1000L + i))         // 2 more each
    try {
      in.addData(b1); out.processAllAvailable()
      in.addData(b2); out.processAllAvailable()
      val got = collect(spark.table("scmq"))
      // batch-1 fills each key to the cap of 3; every batch-2 row drops
      b2.foreach(r => assert(!got.find(t => t._1 == r.key && t._2 == r.ts).get._4,
        s"cross-batch overcap kept: ${r.key}@${r.ts}"))
      // replayed batch parity: same two frames through the batch path
      val replay = collect(run(b1.toDF())) ++
        { // second frame must see the first's state — replay both in one
          // ordered frame instead (ts orders them identically)
          Seq.empty
        }
      val oneShot = collect(run((b1 ++ b2).toDF()))
      assert(got == oneShot, "stream != replayed batch")
      assert(replay.forall(got.contains), "batch-1 prefix diverged")
    } finally out.stop()
  }
}
