package graft

import graft.text.Pii
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    (1L, "mail a.b-c_d%e+f@ex-ample.co.uk and bob@host.org today"),
    (2L, "call +670-123-4567 or 62-555-123 now"),
    (3L, "server 10.0.255.3 peer 192.168.1.1"),
    (4L, "mixed x@y.io +1-234-5678 8.8.8.8"),
    (5L, "clean text with no pii at all"),
    (6L, "")
  ).toDF("id", "t")

  test("scrub counts each PII class independently") {
    val r = Pii.scrub(fixture, "t")
      .select($"id", $"n_emails", $"n_ips", $"n_phones")
      .as[(Long, Long, Long, Long)].collect().map(x => x._1 -> (x._2, x._3, x._4)).toMap
    assert(r(1L) == ((2L, 0L, 0L)))
    assert(r(2L) == ((0L, 0L, 2L)))
    assert(r(3L) == ((0L, 2L, 0L)))
    assert(r(4L) == ((1L, 1L, 1L)))
    assert(r(5L) == ((0L, 0L, 0L)))
    assert(r(6L) == ((0L, 0L, 0L)))
  }

  test("redact replaces every match and leaves clean text untouched") {
    val red = Pii.scrub(fixture, "t").select($"id", $"redacted")
      .as[(Long, String)].collect().toMap
    assert(red(1L) == "mail <EMAIL> and <EMAIL> today")
    assert(red(2L) == "call <PHONE> or <PHONE> now")
    assert(red(3L) == "server <IP> peer <IP>")
    assert(red(4L) == "mixed <EMAIL> <PHONE> <IP>")
    assert(red(5L) == "clean text with no pii at all")
    assert(red(6L) == "")
  }

  test("redaction is idempotent: a second scrub finds nothing") {
    val once = Pii.scrub(fixture, "t").select($"id", $"redacted".as("t"))
    val twice = Pii.scrub(once, "t")
    val counts = twice.agg(
      sum($"n_emails" + $"n_ips" + $"n_phones").as("n")).as[Long].head()
    assert(counts == 0L, "placeholders must not re-match any pattern")
    val stable = twice.filter($"redacted" =!= $"t").count()
    assert(stable == 0L, "second redaction must be a no-op")
  }
}
