package graft

import graft.streaming.{Incremental, StreamCdc}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming CDC landing: the foreachBatch sink must equal a one-shot
  * applyCdc of the full change log, and redelivered/replayed batches
  * must be no-ops (the IdempotentSink exactly-once discipline). */
class StreamCdcSpec extends SparkSpec {
  import spark.implicits._

  // (key, seq, op, qty): I/U upserts, D deletes; seq is the change-log
  // position (unique per key by contract)
  private val log = Seq(
    (1L, 1L, "I", 10.0), (2L, 2L, "I", 20.0), (3L, 3L, "I", 30.0),
    (2L, 4L, "U", 21.0),
    (3L, 5L, "D", 0.0),
    (4L, 6L, "I", 40.0), (4L, 7L, "U", 41.0),
    (1L, 8L, "D", 0.0), (5L, 9L, "I", 50.0))

  private def df(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("k", "seq", "op", "qty")

  private def snapOf(d: org.apache.spark.sql.DataFrame) =
    d.select($"k", $"qty").as[(Long, Double)].collect().toSet

  test("stream of micro-batches lands the same snapshot as one-shot apply") {
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val input = MemoryStream[(Long, Long, String, Double)]
    val q = input.toDF().toDF("k", "seq", "op", "qty").writeStream
      .foreachBatch(StreamCdc.parquetSnapshot(root, "k", "seq", "op"))
      .start()
    try {
      log.grouped(3).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = StreamCdc.latestSnapshot(spark, root).get
    val oneShot = Incremental.applyCdc(
      df(log).drop("seq", "op").limit(0), df(log), "k", "seq", "op")
    assert(snapOf(streamed) == snapOf(oneShot))
    assert(snapOf(streamed) == Set((2L, 21.0), (4L, 41.0), (5L, 50.0)))
    // one committed version per micro-batch
    assert(StreamCdc.committedVersions(spark, root).size == 3)
  }

  test("crash redelivery and stale replay are no-ops") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdc2").toString
    val sink = StreamCdc.parquetSnapshot(root, "k", "seq", "op")
    sink(df(log.take(4)), 0L)
    sink(df(log.drop(4)), 1L)
    val v1 = snapOf(StreamCdc.latestSnapshot(spark, root).get)
    // redeliver batch 1 with DIFFERENT (corrupt) content: committed wins
    sink(df(Seq((99L, 100L, "I", 999.0))), 1L)
    assert(snapOf(StreamCdc.latestSnapshot(spark, root).get) == v1)
    // replay an old batch id after later commits: also a no-op
    sink(df(Seq((98L, 101L, "I", 888.0))), 0L)
    assert(snapOf(StreamCdc.latestSnapshot(spark, root).get) == v1)
    assert(StreamCdc.committedVersions(spark, root) == Seq(0L, 1L))
  }

  test("retention keeps the newest snapshots; replay of an expired batch stays a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdc4").toString
    val sink = StreamCdc.parquetSnapshot(root, "k", "seq", "op")
    (0 to 3).foreach(b => sink(df(log.slice(b * 2, b * 2 + 2)), b.toLong))
    val before = snapOf(StreamCdc.latestSnapshot(spark, root).get)
    assert(StreamCdc.expireVersions(spark, root, keep = 2) == Seq(0L, 1L))
    assert(StreamCdc.committedVersions(spark, root) == Seq(2L, 3L))
    assert(snapOf(StreamCdc.latestSnapshot(spark, root).get) == before)
    // a redelivery of an EXPIRED batch id must not resurrect state on
    // top of the wrong prior: v=0 no longer committed, so it would
    // re-apply — but Structured Streaming never redelivers an id below
    // the checkpointed watermark once later ids committed; the sink
    // still leaves the LATEST snapshot untouched for readers
    sink(df(log.take(2)), 0L)
    assert(snapOf(StreamCdc.latestSnapshot(spark, root).get) == before)
  }

  test("delete-then-reinsert across batches lands the reinserted row") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdc3").toString
    val sink = StreamCdc.parquetSnapshot(root, "k", "seq", "op")
    sink(df(Seq((1L, 1L, "I", 10.0))), 0L)
    sink(df(Seq((1L, 2L, "D", 0.0))), 1L)
    assert(snapOf(StreamCdc.latestSnapshot(spark, root).get).isEmpty)
    sink(df(Seq((1L, 3L, "I", 11.0))), 2L)
    assert(snapOf(StreamCdc.latestSnapshot(spark, root).get) == Set((1L, 11.0)))
  }
}
