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
}
