package graft

import graft.streaming.StreamNbGate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class NbDoc(doc_id: Long, text: String)

/** Batch ≡ stream for the naive-Bayes routing gate: the same `route`
  * runs on a batch frame and a MemoryStream, and every (doc, pred,
  * margin, verdict) row must agree — including the unseen-token,
  * empty-text and cross-batch cases.
  */
class StreamNbGateSpec extends SparkSpec {
  import spark.implicits._

  private val trainDocs = Seq(
    ("en", "the cat sat on the mat"),
    ("en", "a dog and a cat"),
    ("en", "the quick brown fox"),
    ("de", "der hund und die katze"),
    ("de", "die schnelle braune katze"),
    ("de", "der mann und die frau"),
    ("fr", "le chat et le chien"),
    ("fr", "la femme et le homme")
  ).toDF("lang", "text")

  private lazy val model = StreamNbGate.train(trainDocs, "lang", "text")

  private val b1 = Seq(
    NbDoc(1, "the cat and the dog"),       // clearly en
    NbDoc(2, "der hund und die frau"),     // clearly de
    NbDoc(3, "zzz qqq unseen tokens"))     // all-unseen → priors decide
  private val b2 = Seq(
    NbDoc(4, "le chien et la femme"),      // clearly fr
    NbDoc(5, ""),                          // empty text → "" token, unseen
    NbDoc(6, "und the et"))                // one token per language → tight margin

  test("model shape: sorted languages, bounded scalars") {
    assert(model.langs == Seq("de", "en", "fr"))
    assert(model.v > 0 && model.tot.size == 3 && model.priorE9.size == 3)
  }

  test("batch ≡ stream: identical routing rows across micro-batches") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[NbDoc]
    val out = StreamNbGate.route(in.toDF(), model, "doc_id", "text",
        reviewBelowE6 = 300000L)
      .writeStream.format("memory").queryName("nbgate1")
      .outputMode("update").start()
    try {
      in.addData(b1); out.processAllAvailable()
      in.addData(b2); out.processAllAvailable()
    } finally out.stop()
    val streamed = spark.table("nbgate1").distinct()
      .collect().map(r => (r.getLong(0),
        (r.getString(1), r.getLong(2), r.getString(3)))).toMap

    val batch = StreamNbGate.route((b1 ++ b2).toDF(), model, "doc_id",
        "text", reviewBelowE6 = 300000L)
      .collect().map(r => (r.getLong(0),
        (r.getString(1), r.getLong(2), r.getString(3)))).toMap

    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(batch(1)._1 == "en" && batch(2)._1 == "de" && batch(4)._1 == "fr")
    // all-unseen doc: the per-token floor is ln(1/(tot_l+V)), so the
    // language with the SMALLEST token mass wins (fr here) — the
    // documented NB floor behavior, not the prior
    assert(batch(3)._1 == "fr")
  }

  test("the uncertainty gate routes tight margins to review") {
    val routed = StreamNbGate.route(b2.toDF(), model, "doc_id", "text",
        reviewBelowE6 = 300000L)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    // doc 6 carries one token of each language — margin is prior-thin
    assert(routed(6) == "review")
    // doc 4 is unambiguous french
    assert(routed(4) == "auto")
  }
}
