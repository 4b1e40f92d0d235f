package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._
import graft.streaming.{StreamChunkDedup, StreamCuration}

case class RawCrawl(doc_id: Long, text: String,
                    ts: java.sql.Timestamp)

/** Two-hop streaming pipeline (the medallion shape): curation stream →
  * parquet silver → file-source stream → chunk-dedup gate → gold. The
  * hops compose through STORAGE, not in one query — each stage's
  * output is a restartable, batch-readable table — and the spec pins
  * the division of labor: exact re-posts die at the curation
  * fingerprint, EDITED re-posts pass it and die on shared chunks, and
  * redaction running before chunking means PII churn cannot disguise a
  * duplicate. */
class StreamPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def toks(n: Int, tag: String = "w"): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")
  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("curation silver feeds the chunk gate; each duplicate class dies at its own hop") {
    val base = java.nio.file.Files.createTempDirectory("spipe").toString
    val (silver, chk1, chk2, idx, gold) =
      (s"$base/silver", s"$base/chk1", s"$base/chk2", s"$base/idx", s"$base/gold")
    implicit val sql = spark.sqlContext
    val input = MemoryStream[RawCrawl]
    val hop1 = StreamCuration.kept(input.toDF(), "doc_id", "text", "ts",
        minTokens = 10)
      .writeStream.format("parquet").option("path", silver)
      .option("checkpointLocation", chk1).outputMode("append").start()
    val silverSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("n_emails", LongType), StructField("n_ips", LongType),
      StructField("n_phones", LongType), StructField("n_tokens", LongType),
      StructField("redacted", StringType)))
    // hop 2 reads the silver TABLE as a stream — storage is the handoff
    lazy val hop2 = spark.readStream.schema(silverSchema).parquet(silver)
      .writeStream.foreachBatch(
        StreamChunkDedup.chunkGate("doc_id", "redacted", 0.5, idx, gold))
      .option("checkpointLocation", chk2).outputMode("append").start()

    val body = toks(120)
    def feed(rows: RawCrawl*): Unit = {
      input.addData(rows: _*)
      hop1.processAllAvailable(); hop2.processAllAvailable()
    }
    try {
      feed(RawCrawl(1L, s"contact a@b.com then $body", ts(0)),
        RawCrawl(2L, toks(80, "other"), ts(1)))
      // batch 2, one doc per duplicate class:
      feed(
        // exact re-post (same redacted bytes) -> hop 1 fingerprint
        RawCrawl(3L, s"contact a@b.com then $body", ts(2)),
        // PII churn only (different email, same body) -> redaction
        // equalizes it -> STILL hop 1's fingerprint
        RawCrawl(4L, s"contact z@q.org then $body", ts(3)),
        // edited head + PII churn -> new fingerprint, passes hop 1,
        // dies on shared body chunks at hop 2
        RawCrawl(5L, s"fresh header here contact z@q.org then $body", ts(4)),
        // genuinely new content -> lands
        RawCrawl(6L, toks(90, "novel"), ts(5)),
        // too short -> dies at the hop-1 quality gate
        RawCrawl(7L, "tiny doc", ts(6)))
      val silverIds = spark.read.parquet(silver).select($"doc_id")
        .as[Long].collect().toSet
      assert(silverIds == Set(1L, 2L, 5L, 6L),
        s"hop 1 must kill exact/PII-churn re-posts and shorts: $silverIds")
      val goldIds = spark.read.parquet(gold).select($"doc_id")
        .as[Long].collect().toSet
      assert(goldIds == Set(1L, 2L, 6L),
        s"hop 2 must kill the edited re-post on shared chunks: $goldIds")
    } finally { hop1.stop(); hop2.stop() }
  }
}
