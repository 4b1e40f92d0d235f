package graft

import graft.core.Tables
import graft.streaming.{Downsample, Incremental}
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming 1-minute downsample equals the batch aggregation") {
    val events = Tables.events(spark, sf).filter($"user_id" < 10)
      .select($"user_id", $"ts", $"value")
    val batch = Downsample.perMinute(events, "user_id", "ts", "value")

    // Drive the same transform through Structured Streaming from parquet.
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = Downsample.streamPerMinute(stream, "user_id", "ts", "value")
      .writeStream.outputMode("complete")
      .format("memory").queryName("downsampled")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("downsampled")
        .select($"user_id", $"minute", $"n", $"mean_value").collect().toSet
      val want = batch
        .select($"user_id", $"minute", $"n", $"mean_value").collect().toSet
      assert(got == want)
    } finally q.stop()
  }

  test("high-water-mark incremental skips already-sunk ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hwm").toString + "/sink"
    val all = spark.range(0, 100).select($"id".as("event_id"))
    // nothing sunk yet -> everything is new
    assert(Incremental.aboveHighWaterMark(spark, all.toDF(), dir, "event_id").count() == 100)
    all.filter($"event_id" < 60).write.parquet(dir)
    val remaining = Incremental.aboveHighWaterMark(spark, all.toDF(), dir, "event_id")
    assert(remaining.count() == 40)
    assert(remaining.agg(min($"event_id")).as[Long].head() == 60L)
  }

  test("notYetProcessed is an anti-join on the key") {
    val src = spark.range(0, 10).toDF("id")
    val done = spark.range(0, 5).toDF("id")
    assert(Incremental.notYetProcessed(src, done, "id").count() == 5)
  }

  test("applyCdc: highest seq wins, D deletes, I inserts, untouched pass through") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val batch = Seq(
      (1L, 10L, "U", "a2"), (1L, 11L, "U", "a3"), // two updates: seq 11 wins
      (2L, 5L, "D", "x"),                         // delete key 2
      (4L, 7L, "I", "d"),                         // insert new key
      (4L, 6L, "D", "x")                          // stale delete loses to seq 7
    ).toDF("k", "seq", "op", "v")
    val got = Incremental.applyCdc(snap, batch, "k", "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a3", 3L -> "c", 4L -> "d"))
  }

  test("applyCdc folded over arriving batches == one apply of the full log") {
    // the incremental landing contract: when the change log arrives in
    // seq order per key (a change-log position is monotone), applying
    // each batch onto the running snapshot commutes with applying the
    // concatenated log once
    val snap0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val batches = Seq(
      Seq((1L, 1L, "U", "a1"), (4L, 2L, "I", "d")),
      Seq((2L, 3L, "D", "x"), (4L, 4L, "U", "d2")),
      Seq((1L, 5L, "U", "a2"), (5L, 6L, "I", "e"), (5L, 7L, "D", "x")))
    val folded = batches.foldLeft(snap0) { (s, b) =>
      Incremental.applyCdc(s, b.toDF("k", "seq", "op", "v"), "k", "seq", "op")
    }.as[(Long, String)].collect().toMap
    val oneShot = Incremental.applyCdc(snap0,
        batches.flatten.toDF("k", "seq", "op", "v"), "k", "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(folded == oneShot && folded == Map(1L -> "a2", 3L -> "c", 4L -> "d2"))
  }

  test("applyCdc is invariant under batch partitioning") {
    val snap = spark.range(0, 100).select($"id".as("k"), ($"id" * 2).as("v"))
    val batch = spark.range(0, 300)
      .select(($"id" % 120).as("k"), $"id".as("seq"),
        when($"id" % 11 === 0, "D").otherwise("U").as("op"), ($"id" + 1000).as("v"))
    val a = Incremental.applyCdc(snap, batch.repartition(1), "k", "seq", "op")
      .orderBy("k").as[(Long, Long)].collect().toSeq
    val b = Incremental.applyCdc(snap, batch.repartition(13), "k", "seq", "op")
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("partitionDelta classifies added/removed/changed/unchanged") {
    val old = Seq(("A", 1L, 10L), ("A", 2L, 20L), ("B", 3L, 30L), ("D", 9L, 90L))
      .toDF("part", "id", "v")
    val neu = Seq(("A", 1L, 10L), ("A", 2L, 20L), ("B", 3L, 31L), ("C", 7L, 70L))
      .toDF("part", "id", "v")
    val delta = Incremental.partitionDelta(old, neu, "part", Seq("id", "v"))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(delta == Map("A" -> "unchanged", "B" -> "changed",
      "C" -> "added", "D" -> "removed"))
  }

  test("partitionDelta flags same-count content changes (checksum, not count)") {
    val old = Seq(("A", 1L, 10L)).toDF("part", "id", "v")
    val neu = Seq(("A", 1L, 11L)).toDF("part", "id", "v") // same rows, new content
    val d = Incremental.partitionDelta(old, neu, "part", Seq("id", "v")).collect()(0)
    assert(d.getString(3) == "changed" && d.getLong(1) == 1L && d.getLong(2) == 1L)
  }

  test("recomputeChanged re-runs the stage only on dirty partitions") {
    val old = Seq(("A", 1L, 10L), ("B", 3L, 30L), ("D", 9L, 90L))
      .toDF("part", "id", "v")
    val neu = Seq(("A", 1L, 10L), ("B", 3L, 31L), ("C", 7L, 70L))
      .toDF("part", "id", "v")
    // the previous run's stage outputs are tagged v1; this run's stage
    // tags v2 — unchanged partitions must keep their v1 outputs
    val prevOut = old.withColumn("stage_ver", lit("v1"))
    val out = Incremental.recomputeChanged(prevOut, old, neu, "part",
      Seq("id", "v"))(df => df.withColumn("stage_ver", lit("v2")))
      .select($"part", $"v", $"stage_ver")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(
      ("A", 10L, "v1"),  // unchanged: previous output spliced through
      ("B", 31L, "v2"),  // changed: recomputed from the NEW snapshot
      ("C", 70L, "v2"))) // added: computed; removed D is gone
  }
}
