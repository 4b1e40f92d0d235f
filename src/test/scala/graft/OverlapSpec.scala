package graft

import org.apache.spark.sql.functions._
import graft.dedup.Overlap

/** KMV corpus-overlap: exactness below the sketch size, estimator
  * sanity above it, determinism under repartitioning. */
class OverlapSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(rows: Seq[(String, Int)]) =
    rows.toDF("g", "x").select(col("g"), md5(col("x").cast("string")).as("h"))

  test("complete sketches (n < k) give exact union/intersection/jaccard") {
    // A = {0..29}, B = {20..49}: |A∩B| = 10, |A∪B| = 50
    val df = hashed((0 until 30).map(("a", _)) ++ (20 until 50).map(("b", _)))
    val r = Overlap.kmvOverlap(df, "g", "h", k = 128)
      .select("g_a", "g_b", "nd_a", "nd_b", "est_union", "est_intersection", "est_jaccard")
      .as[(String, String, Long, Long, Double, Double, Double)].collect()
    assert(r.length == 1)
    val (ga, gb, nda, ndb, u, i, j) = r.head
    assert((ga, gb, nda, ndb) == ("a", "b", 30L, 30L))
    assert(u == 50.0 && i == 10.0 && j == 0.2)
  }

  test("disjoint groups estimate zero intersection") {
    val df = hashed((0 until 40).map(("a", _)) ++ (1000 until 1040).map(("b", _)))
    val r = Overlap.kmvOverlap(df, "g", "h", k = 16)
      .select("est_intersection", "est_jaccard").as[(Double, Double)].collect().head
    assert(r == ((0.0, 0.0)))
  }

  test("estimation regime (n >> k): estimates track truth, tighter as k grows") {
    // A = {0..1999}, B = {1000..2999}: union 3000, jaccard 1000/3000.
    // The draws are md5-deterministic, so these are fixed samples, not
    // flaky randomness: k=128 (se ~9%) happens to land 3.5 se off on
    // the union; k=512 (se ~4.4%) must land much closer.
    val df = hashed((0 until 2000).map(("a", _)) ++ (1000 until 3000).map(("b", _)))
    val r128 = Overlap.kmvOverlap(df, "g", "h", k = 128)
      .select("est_union", "est_jaccard").as[(Double, Double)].collect().head
    assert(math.abs(r128._1 - 3000.0) / 3000.0 < 0.4, s"union est ${r128._1}")
    assert(math.abs(r128._2 - 1.0 / 3) / (1.0 / 3) < 0.4, s"jaccard est ${r128._2}")
    val r512 = Overlap.kmvOverlap(df, "g", "h", k = 512)
      .select("est_union", "est_jaccard").as[(Double, Double)].collect().head
    assert(math.abs(r512._1 - 3000.0) / 3000.0 < 0.15, s"union est ${r512._1}")
    assert(math.abs(r512._2 - 1.0 / 3) / (1.0 / 3) < 0.15, s"jaccard est ${r512._2}")
  }

  test("estimates identical under repartitioning") {
    val df = hashed((0 until 500).map(("a", _)) ++ (250 until 900).map(("b", _)) ++
      (0 until 100).map(("c", _)))
    def run(d: org.apache.spark.sql.DataFrame) =
      Overlap.kmvOverlap(d, "g", "h", k = 64)
        .orderBy("g_a", "g_b").collect().toSeq
    assert(run(df) == run(df.repartition(11)))
  }
}
