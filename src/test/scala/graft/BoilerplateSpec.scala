package graft

import graft.text.Boilerplate
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // "cookie policy" appears in 3 of 4 docs of source s1 (75% > 50%),
  // so it is boilerplate there. Source s2 has the same bigram in 1 of
  // 2 docs (50%, not strictly above) — it survives. Doc 6 is shorter
  // than the gram.
  private val fixture = Seq(
    (1L, "s1", "we use cookie policy here daily"),
    (2L, "s1", "accept the cookie policy to continue"),
    (3L, "s1", "read our cookie policy first"),
    (4L, "s1", "no shared phrases in this one"),
    (5L, "s2", "cookie policy"),
    (6L, "s2", "single")
  ).toDF("doc_id", "source", "text")

  test("masks every position covered by a high-df n-gram, scoped per source") {
    val out = Boilerplate.removeRepeatedNgrams(fixture, "doc_id", "source", "text",
        n = 2, maxDfPct = 50)
      .select($"doc_id", $"n_tokens", $"n_removed", $"cleaned")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((6L, 2L, "we use here daily")))
    assert(out(2L) == ((6L, 2L, "accept the to continue")))
    assert(out(3L) == ((5L, 2L, "read our first")))
    assert(out(4L) == ((6L, 0L, "no shared phrases in this one")))
    // same bigram, different scope: df=1 in s2, survives
    assert(out(5L) == ((2L, 0L, "cookie policy")))
    // shorter than n: no grams, passes through
    assert(out(6L) == ((1L, 0L, "single")))
  }

  test("a fully-boilerplate document reassembles to the empty string") {
    val dup = Seq(
      (1L, "s", "ad ad"), (2L, "s", "ad ad"), (3L, "s", "ad ad"),
      (4L, "s", "keep me ad ad")
    ).toDF("doc_id", "source", "text")
    val out = Boilerplate.removeRepeatedNgrams(dup, "doc_id", "source", "text",
        n = 2, maxDfPct = 50)
      .select($"doc_id", $"n_removed", $"cleaned")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((2L, "")))
    assert(out(4L) == ((2L, "keep me")))
  }

  test("mask-back join broadcasts the boilerplate gram set") {
    val emb = graft.core.Tables.documents(spark, sf)
    val plan = Boilerplate.removeRepeatedNgrams(emb, "doc_id", "source", "text",
        n = 2, maxDfPct = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast mask-back join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
