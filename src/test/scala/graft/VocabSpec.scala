package graft

import org.apache.spark.sql.functions._
import graft.text.Vocab

/** Corpus vocabulary stats: exact counts, total-order ranking, coverage
  * arithmetic, and the TakeOrderedAndProject plan shape (top-k must
  * never be a global sort).
  */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    "b b b a a c", "a b", " a  c ", "d"
  ).toDF("text")
  // counts: a=4, b=5... recount: doc1: b3 a2 c1; doc2: a1 b1; doc3: a1 c1; doc4: d1
  // => a=4, b=4, c=2, d=1, total=11

  test("topVocab: exact counts, rank ties broken by token, exact coverage") {
    val top = Vocab.topVocab(corpus, "text", k = 3)
      .select("token", "cnt", "rank", "cum_share")
      .as[(String, Long, Long, Double)].collect().sortBy(_._3)
    assert(top.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("a", 4L, 1L), ("b", 4L, 2L), ("c", 2L, 3L)))
    assert(top(0)._4 == 4.0 / 11)
    assert(top(1)._4 == 8.0 / 11)
    assert(top(2)._4 == 10.0 / 11)
  }

  test("topVocab: k larger than vocabulary returns the whole table") {
    val all = Vocab.topVocab(corpus, "text", k = 100)
    assert(all.count() == 4)
    assert(all.agg(max("cum_share")).as[Double].head() == 1.0)
  }

  test("topVocab plans TakeOrderedAndProject, not a global sort") {
    val plan = Vocab.topVocab(corpus, "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("growthCurve: hand-computed cumulative vocab and occurrences; docs past the last checkpoint ignored") {
    val docs = Seq(
      (1L, "a b a"),   // tokens 3, new types {a,b}
      (2L, "b c"),     // tokens 2, new {c}
      (5L, "c d d"),   // tokens 3, new {d}
      (9L, "e"),       // tokens 1, new {e}
      (99L, "z z"))    // past last checkpoint → ignored
      .toDF("doc_id", "text")
    val curve = Vocab.growthCurve(docs, "doc_id", "text", Seq(1L, 4L, 10L))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(curve.toSeq == Seq(
      (1L, 3L, 2L, 2.0 / 3),
      (4L, 5L, 3L, 3.0 / 5),
      (10L, 9L, 5L, 5.0 / 9)))
    // determinism under partitioning
    val again = Vocab.growthCurve(docs.repartition(4), "doc_id", "text", Seq(1L, 4L, 10L))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(again.toSeq == curve.toSeq)
  }

  test("tokenCounts: stable under repartitioning") {
    val a = Vocab.tokenCounts(corpus, "text").as[(String, Long)].collect().toMap
    val b = Vocab.tokenCounts(corpus.repartition(5), "text")
      .as[(String, Long)].collect().toMap
    assert(a == b && a("a") == 4L)
  }

  test("coverageEstimate: hand-checked Good-Turing + Chao1 per group") {
    // group g: tokens a a b c  -> N=4 V=3 f1=2 (b,c) f2=1 (a:2)
    // group h: tokens x x x    -> N=3 V=1 f1=0 f2=0
    val docs = Seq(("g", "a a b"), ("g", "c"), ("h", "x x x"))
      .toDF("grp", "text")
    val got = Vocab.coverageEstimate(docs, Seq("grp"), "text")
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"),
          r.getAs[Long]("f1"), r.getAs[Long]("f2"),
          r.getAs[Double]("p_unseen"), r.getAs[Double]("chao1"))).toMap
    assert(got("g") == ((4L, 3L, 2L, 1L, 0.5, 3.0 + 2.0 / 4.0)))
    // no singletons: zero unseen mass, Chao1 collapses to V
    assert(got("h") == ((3L, 1L, 0L, 0L, 0.0, 1.0)))
  }

  test("coverageEstimate: singleton-heavy corpus says most mass unseen") {
    val docs = (0 until 50).map(i => ("g", s"tok$i uniq$i"))
      .toDF("grp", "text")
    val r = Vocab.coverageEstimate(docs, Seq("grp"), "text").collect()(0)
    assert(r.getAs[Double]("p_unseen") == 1.0) // every token a singleton
    assert(r.getAs[Long]("vocab") == 100L)
  }
}
