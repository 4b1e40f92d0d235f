package graft

import graft.functions.AcCounts
import org.apache.spark.sql.functions._

/** Aho–Corasick phrase counting ([[graft.functions.AcCounts]]):
  * the textbook automaton cases, overlap semantics, brute-force
  * parity, and the error contract. */
class AcCountsSpec extends SparkSpec {
  import spark.implicits._

  AcCounts.register(spark)

  private def counts(text: String, dict: Seq[String]): Seq[Long] =
    Seq(text).toDF("t")
      .select(call_function("ac_counts", $"t",
        array(dict.map(lit): _*)).as("c"))
      .as[Seq[Long]].head()

  test("the classic {he, she, his, hers} automaton on 'ushers'") {
    assert(counts("ushers", Seq("he", "she", "his", "hers")) ==
      Seq(1L, 1L, 0L, 1L))
  }

  test("overlapping occurrences all count") {
    assert(counts("aaaa", Seq("aa")) == Seq(3L))
    assert(counts("sort merge sort merge", Seq("sort merge", "merge")) ==
      Seq(2L, 2L))
  }

  test("failure links cross pattern boundaries mid-match") {
    // scanning "table scan": "table" fails into "le sc"? no — but
    // "ab" inside "table" and "scan" suffix-sharing "an" must all fire
    assert(counts("table scan", Seq("ab", "an", "scan", "table scan")) ==
      Seq(1L, 1L, 1L, 1L))
  }

  test("brute-force parity on generated text") {
    val rnd = new scala.util.Random(7)
    val alpha = "abc"
    val dict = Seq("a", "ab", "ba", "abc", "cab", "bb")
    (1 to 30).foreach { _ =>
      val s = Seq.fill(40)(alpha(rnd.nextInt(3))).mkString
      val expect = dict.map(p =>
        (0 to s.length - p.length).count(i => s.regionMatches(i, p, 0, p.length)).toLong)
      assert(counts(s, dict) == expect, s"text=$s")
    }
  }

  test("supplementary-plane patterns count correctly (surrogate pairs stay paired)") {
    // 𠜎 (U+2070E) and 𝕊 (U+1D54A) are surrogate PAIRS in UTF-16; the
    // automaton walks code units, which stays exact because high/low
    // surrogate ranges are disjoint — a pattern can never match across
    // half of a pair. Pin it.
    val text = "𠜎a𠜎𠜎b𝕊𠜎"
    assert(counts(text, Seq("𠜎", "𠜎𠜎", "a𠜎", "𝕊")) == Seq(4L, 1L, 1L, 1L))
    // a lone high surrogate as text must not spuriously match
    val lone = new String(Array('\uD841')) // high surrogate of 𠜎
    assert(counts(lone, Seq("𠜎")) == Seq(0L))
  }

  test("an empty dictionary is rejected (counts would have no alignment)") {
    intercept[Exception] {
      Seq("x").toDF("t")
        .select(call_function("ac_counts", $"t",
          array().cast("array<string>")))
        .collect()
    }
  }

  test("null text is null; duplicate or empty patterns are rejected") {
    val r = Seq(Option.empty[String]).toDF("t")
      .select(call_function("ac_counts", $"t", array(lit("x"))).as("c"))
      .as[Option[Seq[Long]]].head()
    assert(r.isEmpty)
    intercept[Exception] {
      Seq("x").toDF("t")
        .select(call_function("ac_counts", $"t", array(lit("a"), lit("a"))))
        .collect()
    }
    intercept[Exception] {
      Seq("x").toDF("t")
        .select(call_function("ac_counts", $"t", array(lit(""))))
        .collect()
    }
  }
}
