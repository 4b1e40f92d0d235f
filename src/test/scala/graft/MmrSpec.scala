package graft

import graft.similarity.Mmr
import org.apache.spark.sql.functions._

/** MMR re-rank: seed is the top-relevance candidate, near-duplicate
  * candidates are displaced by diverse ones, and the selection is
  * deterministic under repartitioning. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // query 100 at the origin-ish; candidates: two near-identical vectors
  // very close to the query, one diverse vector slightly less relevant
  private def emb = Seq(
    (100L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.10f, 0.00f)),   // top relevance
    (2L, Array(0.99f, 0.11f, 0.00f)),   // near-dup of 1
    (3L, Array(0.70f, -0.60f, 0.30f)),  // diverse, lower relevance
    (4L, Array(-1.0f, 0.0f, 0.0f))      // anti-relevant
  ).toDF("vec_id", "embedding")

  test("near-dup of the seed is displaced by the diverse candidate") {
    val out = Mmr.rerank(emb, emb.filter($"vec_id" === 100), "vec_id",
        "embedding", candK = 4, k = 2)
      .orderBy($"pos").as[(Long, Long, Long)].collect().toSeq
    // plain top-2 by cosine would be (1, 2); MMR keeps 1 then jumps to 3
    assert(out == Seq((100L, 1L, 1L), (100L, 2L, 3L)))
  }

  test("k bounded by candidate count; selection deterministic under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Mmr.rerank(df, df.filter($"vec_id" === 100), "vec_id",
          "embedding", candK = 10, k = 10)
        .orderBy($"pos").as[(Long, Long, Long)].collect().toSeq
    val a = run(emb)
    assert(a.length == 4, "only 4 candidates exist")
    assert(a == run(emb.repartition(7)))
  }
}
