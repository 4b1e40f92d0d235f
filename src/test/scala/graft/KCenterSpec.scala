package graft

import graft.similarity.KCenter
import org.apache.spark.sql.functions._

/** Greedy farthest-point k-center ([[graft.similarity.KCenter]]):
  * hand-traced selection order, tie-breaks, coverage monotonicity,
  * partitioning determinism. */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  private def vec(x: Double): Seq[Float] = Seq(x.toFloat, 0f)

  // a line: greedy from the min-id seed must walk the gaps
  private lazy val line = Seq(
    (1L, vec(0.0)), (2L, vec(0.01)), (3L, vec(0.02)),
    (4L, vec(0.10)), (5L, vec(0.20))).toDF("vec_id", "embedding")

  test("greedy selection order: seed, then farthest-first") {
    val cs = KCenter.centers(line, "vec_id", "embedding", 3)
    assert(cs.map(_.id) == Seq(1L, 5L, 4L), cs.map(_.id))
  }

  test("equidistant farthest candidates break ties to the smaller id") {
    val sym = Seq((1L, vec(0.0)), (7L, vec(-0.05)), (3L, vec(0.05)))
      .toDF("vec_id", "embedding")
    val cs = KCenter.centers(sym, "vec_id", "embedding", 2)
    assert(cs.map(_.id) == Seq(1L, 3L), cs.map(_.id))
  }

  test("assignment picks the nearest center with integer distances") {
    val cs = KCenter.centers(line, "vec_id", "embedding", 3)
    val a = KCenter.assign(line, "vec_id", "embedding", cs)
      .select($"id", $"center_id", $"d2").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(a(1L) == ((1L, 0L)) && a(4L) == ((4L, 0L)) && a(5L) == ((5L, 0L)))
    assert(a(2L)._1 == 1L && a(3L)._1 == 1L)
    // 0.01 scaled to 1e5: d2 = (1e5)^2
    assert(a(2L)._2 == 100000L * 100000L)
  }

  test("coverage radius is monotone non-increasing in k") {
    val docs = (1L to 60L)
      .map(i => (i, Seq(((i * 37 % 100) / 100.0).toFloat,
        ((i * 61 % 100) / 100.0).toFloat)))
      .toDF("vec_id", "embedding")
    def radius(k: Int): Long = {
      val cs = KCenter.centers(docs, "vec_id", "embedding", k)
      KCenter.assign(docs, "vec_id", "embedding", cs)
        .agg(max($"d2")).as[Long].collect().head
    }
    val rs = Seq(2, 4, 8).map(radius)
    assert(rs == rs.sorted.reverse, s"radii must not increase: $rs")
    assert(rs.last < rs.head, "more centers must tighten this spread corpus")
  }

  test("selection is identical at any partitioning") {
    val docs = (1L to 80L)
      .map(i => (i, Seq((math.sin(i.toDouble) / 2).toFloat,
        (math.cos(i.toDouble * 1.7) / 2).toFloat)))
    def run(parts: Int): Seq[Long] =
      KCenter.centers(docs.toDF("vec_id", "embedding").repartition(parts),
        "vec_id", "embedding", 6).map(_.id)
    assert(run(1) == run(16))
  }
}
