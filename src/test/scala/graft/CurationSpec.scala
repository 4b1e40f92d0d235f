package graft

import graft.text.Curation
import org.apache.spark.sql.functions._

/** The composed curation chain: NFC → PII redaction → fingerprint
  * dedup → quality gate. Unicode escapes are explicit so the
  * decomposed/precomposed distinction survives editors. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redaction canonicalizes crawls that differ only in PII; NFC unifies spellings") {
    val fixture = Seq(
      // same page, two crawls: different session emails, decomposed vs
      // precomposed é — duplicates only after NFC + redaction
      (1L, "s1", "Cafe\u0301 menu mail a@x.org please visit our lovely shop"),
      (2L, "s2", "Caf\u00e9 menu mail b@y.org please visit our lovely shop"),
      // unique page, passes quality
      (3L, "s1", "completely different content with enough tokens to pass the gate"),
      // unique page, too short
      (4L, "s2", "too short")
    ).toDF("doc_id", "source", "text")
    val out = Curation.curate(fixture, "doc_id", "text", minTokens = 5)
      .select($"doc_id", $"n_emails", $"n_copies", $"is_canonical",
        $"passes_quality", $"kept")
      .as[(Long, Long, Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out(1L) == ((1L, 2L, true, true, true)))   // canonical dupe, kept
    assert(out(2L) == ((1L, 2L, false, true, false))) // shadowed dupe
    assert(out(3L) == ((0L, 1L, true, true, true)))
    assert(out(4L) == ((0L, 1L, true, false, false))) // quality-gated
  }

  test("kept() returns exactly the canonical quality-passing subset") {
    val fixture = Seq(
      (10L, "s", "alpha beta gamma delta epsilon zeta"),
      (11L, "s", "alpha beta gamma delta epsilon zeta"),
      (12L, "s", "tiny")
    ).toDF("doc_id", "source", "text")
    val ids = Curation.kept(fixture, "doc_id", "text", minTokens = 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(10L))
  }

  test("two shuffles only: one fingerprint aggregation and its join back") {
    val fixture = graft.core.Tables.documents(spark, sf)
    val plan = Curation.curate(fixture, "doc_id", "text", minTokens = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"no all-pairs shapes:\n$plan")
  }
}
