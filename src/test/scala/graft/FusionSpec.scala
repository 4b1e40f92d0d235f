package graft

import graft.text.Fusion

/** Reciprocal-rank fusion: hand-computed scores, consensus promotion,
  * k-bounding, determinism. */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  // system A ranks docs 1,2,3; system B ranks 2,1,4.
  private def sysA = Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L))
    .toDF("qid", "doc", "rank")
  private def sysB = Seq(("q", 2L, 1L), ("q", 1L, 2L), ("q", 4L, 3L))
    .toDF("qid", "doc", "rank")

  private def c(r: Long) = math.floor(1e9 / (60.0 + r) + 0.5).toLong

  test("fused scores are the exact integer sums; consensus beats single-system rank 1") {
    val out = Fusion.rrf(Seq(sysA, sysB), "qid", "doc", c = 60L, k = 10)
      .select("doc", "rank", "rrf_e9", "n_systems")
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    // docs 1 and 2 both appear at ranks {1,2} → identical scores; doc-id
    // tie-break puts 1 first
    assert(out(1L) == ((1L, 1L, c(1) + c(2), 2L)))
    assert(out(2L) == ((2L, 2L, c(1) + c(2), 2L)))
    assert(out(3L) == ((3L, 3L, c(3), 1L)))
    assert(out(4L) == ((4L, 4L, c(3), 1L)))
  }

  test("k bounds the fused list; single input is a rank-stable pass-through") {
    assert(Fusion.rrf(Seq(sysA, sysB), "qid", "doc", 60L, k = 2).count() == 2)
    val solo = Fusion.rrf(Seq(sysA), "qid", "doc", 60L, 10)
      .select("doc", "rank").as[(Long, Long)].collect().toSet
    assert(solo == Set((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("deterministic under repartitioning") {
    val a = Fusion.rrf(Seq(sysA.repartition(3), sysB.repartition(2)),
      "qid", "doc", 60L, 10)
      .select("doc", "rank", "rrf_e9").as[(Long, Long, Long)].collect().toSet
    val b = Fusion.rrf(Seq(sysA, sysB), "qid", "doc", 60L, 10)
      .select("doc", "rank", "rrf_e9").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
