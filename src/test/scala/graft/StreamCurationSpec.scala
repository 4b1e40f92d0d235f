package graft

import graft.streaming.StreamCuration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class CrawlRec(doc_id: Long, ts: java.sql.Timestamp, text: String)

/** Streaming curation: the stateless stages act per micro-batch, the
  * fingerprint dedup holds across batches, and the result replays to
  * the batch operator when crawl order is id order. */
class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("recrawl differing only in PII is dropped across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[CrawlRec]
    val q = StreamCuration.kept(input.toDF(), "doc_id", "text", "ts",
        minTokens = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("scur").start()
    try {
      input.addData(
        CrawlRec(1, ts("2024-01-01 10:00:00"),
          "Café menu mail a@x.org please visit our lovely shop"),
        CrawlRec(2, ts("2024-01-01 10:00:01"), "too short"))
      q.processAllAvailable()
      input.addData( // same page, later crawl: precomposed é, new email
        CrawlRec(3, ts("2024-01-01 10:10:00"),
          "Café menu mail b@y.org please visit our lovely shop"),
        CrawlRec(4, ts("2024-01-01 10:10:01"),
          "completely different content with enough tokens to pass the gate"))
      q.processAllAvailable()
      val out = spark.table("scur").select($"doc_id", $"n_emails")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      // 1 kept (first arrival), 2 quality-gated, 3 dup of 1, 4 kept
      assert(out == Seq((1L, 1L), (4L, 0L)))
    } finally q.stop()
  }

  test("id-ordered arrival replays the batch operator's kept() set") {
    implicit val sql = spark.sqlContext
    val fixture = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "alpha beta gamma delta epsilon zeta"),
      (12L, "tiny"),
      (13L, "a second unique page with plenty of tokens in it"))
    val input = MemoryStream[CrawlRec]
    val q = StreamCuration.kept(input.toDF(), "doc_id", "text", "ts",
        minTokens = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("scur_replay").start()
    try {
      fixture.zipWithIndex.foreach { case ((id, txt), i) =>
        input.addData(CrawlRec(id, ts(f"2024-01-01 10:00:${i}%02d"), txt))
      }
      q.processAllAvailable()
      val streamed = spark.table("scur_replay")
        .select($"doc_id").as[Long].collect().toSet
      val batch = graft.text.Curation.kept(
          fixture.toDF("doc_id", "text"), "doc_id", "text", minTokens = 3)
        .select($"doc_id").as[Long].collect().toSet
      assert(streamed == batch && batch == Set(10L, 13L))
    } finally q.stop()
  }

  test("watermarked dedup bounds state and still drops in-window dups") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[CrawlRec]
    val q = StreamCuration.kept(input.toDF(), "doc_id", "text", "ts",
        minTokens = 2, watermarkDelay = Some("10 minutes"))
      .writeStream.outputMode("append").format("memory")
      .queryName("scur_wm").start()
    try {
      input.addData(CrawlRec(1, ts("2024-01-01 10:00:00"),
        "same page body with several tokens"))
      q.processAllAvailable()
      input.addData(CrawlRec(2, ts("2024-01-01 10:05:00"), // in-window dup
        "same page body with several tokens"))
      q.processAllAvailable()
      val ids = spark.table("scur_wm").select($"doc_id").as[Long].collect().toSet
      assert(ids == Set(1L))
    } finally q.stop()
  }
}
