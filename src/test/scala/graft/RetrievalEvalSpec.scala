package graft

import graft.text.RetrievalEval

/** Retrieval metrics on hand-checked frames: perfect ranking scores 1,
  * no-hit queries score 0, queries without positive qrels are NULL
  * (undefined, not a failure), and the graded nDCG discounts exactly. */
class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  // run: q1 perfect (both relevant docs on top), q2 hits nothing
  // relevant, q3 has no qrels at all, q4 graded order swapped
  private val runs = Seq(
    ("q1", "a", 1L), ("q1", "b", 2L), ("q1", "x", 3L),
    ("q2", "x", 1L), ("q2", "y", 2L),
    ("q3", "a", 1L),
    ("q4", "lo", 1L), ("q4", "hi", 2L)).toDF("q", "doc", "rank")
  private val qrels = Seq(
    ("q1", "a", 2L), ("q1", "b", 1L),
    ("q2", "z", 1L),
    ("q4", "hi", 2L), ("q4", "lo", 1L),
    ("q4", "zero", 0L) // rel 0 rows must be ignored entirely
  ).toDF("q", "doc", "rel")

  private lazy val out = RetrievalEval.metrics(
      runs, qrels, "q", "doc", "rank", "rel", k = 10)
    .collect().map(r => r.getString(0) -> r).toMap

  test("perfect ranking: recall = rr = ndcg = 1") {
    val r = out("q1")
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0)
  }

  test("relevant docs exist but none retrieved: all zeros") {
    val r = out("q2")
    assert(r.getLong(1) == 1 && r.getLong(2) == 0)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("no positive qrels: metrics NULL, not zero") {
    val r = out("q3")
    assert(r.getLong(1) == 0)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("graded nDCG: swapped grades score the hand-computed discount") {
    val r = out("q4")
    // dcg = (2^1-1)/log2(2) + (2^2-1)/log2(3); idcg = 3/log2(2) + 1/log2(3)
    val dcg = 1.0 / 1.0 + 3.0 / (math.log(3.0) / math.log(2.0))
    val idcg = 3.0 / 1.0 + 1.0 / (math.log(3.0) / math.log(2.0))
    assert(math.abs(r.getDouble(5) - math.rint(dcg / idcg * 1e6) / 1e6) < 1e-9)
    assert(r.getDouble(4) == 1.0, "first relevant at rank 1")
    assert(r.getDouble(3) == 1.0, "both relevant retrieved")
  }

  test("k truncates both the run and the ideal") {
    val deep = Seq(("q", "a", 1L), ("q", "b", 2L), ("q", "c", 3L)).toDF("q", "doc", "rank")
    val rels = Seq(("q", "c", 1L), ("q", "d", 1L)).toDF("q", "doc", "rel")
    val m = RetrievalEval.metrics(deep, rels, "q", "doc", "rank", "rel", k = 2)
      .collect().head
    // c sits at rank 3 > k: no hits within the cutoff
    assert(m.getLong(2) == 0 && m.getDouble(3) == 0.0 && m.getDouble(5) == 0.0)
  }
}
