package graft

import graft.text.LangModel
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram LM ([[graft.text.LangModel.trainKn]]
  * / [[scoreKn]]): hand-computed probabilities, discounted-mass
  * conservation, backoff edges, partitioning determinism. */
class KnLmSpec extends SparkSpec {
  import spark.implicits._

  // corpus: c2 = {(a,b):2, (b,a):2, (b,c):1}; B=3, V=3
  // ctx: a→(c1=2, n1p_left=1), b→(c1=3, n1p_left=2)
  // cont: n1p_right(a)=n1p_right(b)=n1p_right(c)=1; Pc(seen)=1/3, Pc(OOV)=1/6
  private lazy val model = LangModel.trainKn(
    Seq((1L, "a b a b a"), (2L, "b c")).toDF("doc_id", "text"),
    "doc_id", "text")

  private def p(bigramDoc: String): Double = {
    val r = LangModel.scoreKn(Seq((9L, bigramDoc)).toDF("doc_id", "text"),
      model, "doc_id", "text").select($"n_bigrams", $"logprob")
      .as[(Long, Double)].collect()
    assert(r.length == 1 && r.head._1 == 1L)
    math.exp(r.head._2)
  }

  test("hand-computed interpolated-KN probabilities (D = 0.75)") {
    assert(math.abs(p("a b") - 0.75) < 1e-8)          // (2-.75 + .75*1*(1/3))/2
    assert(math.abs(p("b a") - 1.75 / 3) < 1e-8)      // (2-.75 + .75*2*(1/3))/3
    assert(math.abs(p("b c") - 0.25) < 1e-8)          // (1-.75 + .75*2*(1/3))/3
  }

  test("unseen bigram under a seen context takes the discounted continuation mass") {
    // (0 + .75*2*Pc(b))/3 with Pc(b)=1/3
    assert(math.abs(p("b b") - 0.5 / 3) < 1e-8)
    // OOV successor: Pc(z) = (0+1)/(3+3) = 1/6 → (.75*1*(1/6))/2
    assert(math.abs(p("a z") - 0.0625) < 1e-8)
  }

  test("unseen context backs off fully to the continuation distribution") {
    assert(math.abs(p("z a") - 1.0 / 3) < 1e-8)  // Pc(a)
    assert(math.abs(p("z z") - 1.0 / 6) < 1e-8)  // OOV floor 1/(B+V)
  }

  test("discounted mass is conserved: sum of P(w2|b) over the vocabulary is 1") {
    // every vocab word occurs as a continuation here, so sum Pc = 1 and
    // the KN identity sum = (c1 - D*n1p)/c1 + D*n1p/c1 * sum(Pc) holds
    val s = p("b a") + p("b b") + p("b c")
    assert(math.abs(s - 1.0) < 1e-8, s"mass $s")
  }

  test("scores are bit-identical at any partitioning") {
    val docs = (1L to 40L)
      .map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 7} tok${i % 2}"))
      .toDF("doc_id", "text")
    val m = LangModel.trainKn(docs.filter($"doc_id" % 3 =!= 0), "doc_id", "text")
    def run(parts: Int): Map[Long, Double] =
      LangModel.scoreKn(docs.repartition(parts), m, "doc_id", "text")
        .select($"doc", $"logprob").as[(Long, Double)].collect().toMap
    assert(run(1) == run(16))
  }
}
