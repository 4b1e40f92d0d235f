package graft

import org.apache.spark.sql.functions._
import graft.similarity.Bitext

/** Margin-based mutual-NN bitext mining: mutuality, margin formula,
  * hub rejection, source-agnostic neighbor frames. */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  // 2-D unit-ish vectors. x1≈y1 (a true pair), x2≈y2 (a true pair),
  // x3 points between y1 and y2 but nearer y1 — NOT y1's best match
  // (x1 is), so mutuality must reject it.
  private def x = Seq(
    (0L, Array(1.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f)),
    (4L, Array(0.8f, 0.6f))).toDF("vec_id", "embedding")
  private def y = Seq(
    (1L, Array(0.995f, 0.0998f)),
    (3L, Array(0.0998f, 0.995f))).toDF("vec_id", "embedding")

  test("minePairs: mutual top-1 only; margins exceed 1 for true pairs") {
    val pairs = Bitext.minePairs(x, y, "vec_id", "embedding", k = 2, minMargin = 1.0)
      .select("xid", "yid").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (2L, 3L))) // x3 (id 4) excluded: y1 prefers x1
  }

  test("marginScores: margin is the integer-exact ratio of pair cosine to mean neighborhood cosine") {
    // hand-built neighbor frames: x0's 2-NN cosines (e9) 900M/700M,
    // y0's 800M/600M; mutual pair cosine 900M.
    val nnXY = Seq((0L, 1, 10L, 900000000L), (0L, 2, 11L, 700000000L))
      .toDF("qid", "rank", "nid", "cos_e9")
    val nnYX = Seq((10L, 1, 0L, 900000000L), (10L, 2, 1L, 500000000L))
      .toDF("qid", "rank", "nid", "cos_e9")
    val out = Bitext.marginScores(nnXY, nnYX, minMargin = 0.0)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == 1)
    val (xid, yid, c, margin) = out.head
    assert((xid, yid, c) == ((0L, 10L, 900000000L)))
    // mean(x side) = 800M, mean(y side) = 700M → margin = 900/750 = 1.2
    assert(margin == 1.2)
  }

  test("marginScores: non-mutual top-1 yields nothing; minMargin filters") {
    val nnXY = Seq((0L, 1, 10L, 900000000L)).toDF("qid", "rank", "nid", "cos_e9")
    val nnYX = Seq((10L, 1, 7L, 950000000L)).toDF("qid", "rank", "nid", "cos_e9")
    assert(Bitext.marginScores(nnXY, nnYX, 0.0).count() == 0)
    val mutual = Seq((10L, 1, 0L, 900000000L)).toDF("qid", "rank", "nid", "cos_e9")
    // margin = 1.0 exactly (single-neighbor frames) → a 1.01 floor drops it
    assert(Bitext.marginScores(nnXY, mutual, 1.01).count() == 0)
    assert(Bitext.marginScores(nnXY, mutual, 1.0).count() == 1)
  }

  test("LSH-fed scale path: bucket-local plan (no nested-loop join), useful recall of brute-force pairs") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val xs = emb.filter(col("vec_id") % 2 === 0)
    val ys = emb.filter(col("vec_id") % 2 === 1)
    def mutual(nnXY: org.apache.spark.sql.DataFrame, nnYX: org.apache.spark.sql.DataFrame) =
      Bitext.marginScores(nnXY, nnYX, minMargin = 0.0)
        .select("xid", "yid").as[(Long, Long)].collect().toSet
    val brute = mutual(
      Bitext.neighborFrame(ys, xs, "vec_id", "embedding", 4),
      Bitext.neighborFrame(xs, ys, "vec_id", "embedding", 4))
    val lshXY = Bitext.toNeighborFrame(
      graft.similarity.Knn.lshTopK(ys, xs, "vec_id", "embedding", 4, numPlanes = 4, numTables = 8))
    val lshYX = Bitext.toNeighborFrame(
      graft.similarity.Knn.lshTopK(xs, ys, "vec_id", "embedding", 4, numPlanes = 4, numTables = 8))
    // the scale path never scans |X|x|Y|: no nested-loop join anywhere
    val plan = Bitext.marginScores(lshXY, lshYX, 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"all-pairs scan leaked into the LSH path:\n$plan")
    val lsh = mutual(lshXY, lshYX)
    assert(brute.nonEmpty)
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH mutual-pair recall $recall of ${brute.size} pairs")
  }

  test("minePairs: deterministic under repartitioning") {
    val a = Bitext.minePairs(x.repartition(3), y.repartition(2),
      "vec_id", "embedding", 2, 1.0)
      .select("xid", "yid", "cos_e9").as[(Long, Long, Long)].collect().toSet
    val b = Bitext.minePairs(x, y, "vec_id", "embedding", 2, 1.0)
      .select("xid", "yid", "cos_e9").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
