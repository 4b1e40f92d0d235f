package graft

import graft.stats.Drift
import graft.streaming.IdempotentSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming arm of the drift monitor: each micro-batch of arriving
  * documents is compared against the LANDED reference histogram and
  * its per-bucket drift rows append through the exactly-once sink —
  * the shape a continuously-ingesting pipeline uses to alarm on a
  * shifted crawl before it lands. Pure composition of Drift.census +
  * IdempotentSink; this spec pins the composition. */
class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch drift rows land exactly once and flag the shifted batch") {
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val reference = Seq.tabulate(200)(i => "l" + i % 4).toDF("lang")
    val input = MemoryStream[String]
    val q = input.toDF().toDF("lang").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val drift = Drift.census(reference, batch, Seq("lang"))
          .withColumn("batch_id", lit(id))
        IdempotentSink.parquet(root)(drift, id)
      }
      .start()
    try {
      input.addData(Seq.tabulate(100)(i => "l" + i % 4): _*) // same mix
      q.processAllAvailable()
      input.addData(Seq.fill(100)("l9"): _*) // fully shifted batch
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(root)
    val psiByBatch = out.groupBy($"batch_id")
      .agg(sum($"psi_contrib").as("psi"))
      .as[(Long, Double)].collect().toMap
    assert(psiByBatch(0L) < 0.01, s"same-mix batch must read stable: $psiByBatch")
    assert(psiByBatch(1L) > 1.0, s"shifted batch must alarm: $psiByBatch")
    // the l9 bucket exists only in batch 1's current side
    assert(out.filter($"lang" === "l9" && $"batch_id" === 1L).count() == 1)
  }
}
