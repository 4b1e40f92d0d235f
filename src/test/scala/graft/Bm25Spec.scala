package graft

import graft.text.Bm25
import org.apache.spark.sql.functions._

/** BM25 retrieval: hand-computed scores on a fixture, ranking
  * semantics, and partitioning-independence of the integer scores. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "whale whale whale shark reef"),
    (2L, "whale reef reef reef reef reef reef"),
    (3L, "shark shark coral coral coral"),
    (4L, "plankton bloom drifts far offshore today again")
  ).toDF("doc_id", "text")

  private def bm25(tf: Long, df: Long, dl: Long, n: Long, l: Long): Long = {
    val w = math.log((2.0 * n + 2) / (2.0 * df + 1)) *
      ((44.0 * l * tf) / (20.0 * l * tf + 6.0 * l + 18.0 * dl * n))
    math.floor(w * 1e9 + 0.5).toLong
  }

  test("scores match the closed form; ranking is (score desc, id asc)") {
    val q = Seq(("q1", "whale")).toDF("qid", "term")
    val out = Bm25.retrieve(docs, "doc_id", "text", q, "qid", "term", k = 5)
      .orderBy($"rank")
      .as[(String, Long, Long, Long)].collect()
    // corpus: N=4, L=5+7+5+7=24; "whale": df=2; doc1 tf=3 dl=5, doc2 tf=1 dl=7
    val s1 = bm25(tf = 3, df = 2, dl = 5, n = 4, l = 24)
    val s2 = bm25(tf = 1, df = 2, dl = 7, n = 4, l = 24)
    assert(s1 > s2, "higher tf in a shorter doc must outscore")
    assert(out.toSeq == Seq(("q1", 1L, 1L, s1), ("q1", 2L, 2L, s2)))
  }

  test("multi-term queries sum per-term weights; k bounds the output") {
    val q = Seq(("q2", "whale"), ("q2", "coral")).toDF("qid", "term")
    val out = Bm25.retrieve(docs, "doc_id", "text", q, "qid", "term", k = 1)
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == 1 && out.head._2 == 1L)
    val expected = Set(1L, 2L, 3L) // only docs containing a query term score
    assert(expected.contains(out.head._3))
  }

  test("integer scores are identical under repartitioning") {
    val q = Seq(("q1", "whale"), ("q1", "reef")).toDF("qid", "term")
    val a = Bm25.retrieve(docs, "doc_id", "text", q, "qid", "term", k = 5)
      .orderBy($"rank").collect().toSeq
    val b = Bm25.retrieve(docs.repartition(7), "doc_id", "text",
        q, "qid", "term", k = 5)
      .orderBy($"rank").collect().toSeq
    assert(a == b)
  }
}
