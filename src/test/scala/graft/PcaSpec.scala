package graft

import graft.core.Tables
import graft.similarity.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("secondMoment matches a hand-computed 2x2 case exactly") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f)),
      (1L, Array(3.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val m = Pca.secondMoment(vecs, "embedding", 2)
      .orderBy("i", "j").as[(Int, Int, Long)].collect().toSeq
    // scaled elements: (1e6, 2e6), (3e6, -1e6)
    val s = 1000000L
    assert(m == Seq(
      (0, 0, 1L * s * s + 9L * s * s),
      (0, 1, 2L * s * s + -3L * s * s),
      (1, 1, 4L * s * s + 1L * s * s)))
  }

  test("secondMoment is invariant under repartitioning") {
    val emb = Tables.embeddings(spark, sf).limit(100)
    val a = Pca.secondMoment(emb.repartition(1), "embedding", 64)
      .orderBy("i", "j").as[(Int, Int, Long)].collect().toSeq
    val b = Pca.secondMoment(emb.repartition(13), "embedding", 64)
      .orderBy("i", "j").as[(Int, Int, Long)].collect().toSeq
    assert(a == b)
  }

  test("topComponent recovers the dominant axis of an anisotropic cloud") {
    // points spread 10x wider along a known unit direction u than off it
    val u = Array(0.6, 0.8)
    val pts = (0 until 200).map { k =>
      val t = (k % 21 - 10) / 10.0 * 10.0 // dominant coordinate in [-10, 10]
      val o = (k % 7 - 3) / 3.0           // off-axis jitter in [-1, 1]
      (k.toLong, Array((t * u(0) - o * u(1)).toFloat, (t * u(1) + o * u(0)).toFloat))
    }.toDF("vec_id", "embedding")
    val m = Pca.secondMoment(pts, "embedding", 2)
    val (v, lambda) = Pca.topComponent(m, 2)
    val dot = math.abs(v(0) * u(0) + v(1) * u(1))
    assert(dot > 0.99, s"recovered direction ${v.toSeq} misaligned with $dot")
    assert(lambda > 0)
    // canonical sign: largest-|coordinate| entry positive
    assert(v(v.indices.maxBy(i => (math.abs(v(i)), -i))) >= 0)
  }

  test("topComponent is deterministic and projection maximizes variance") {
    val emb = Tables.embeddings(spark, sf)
    val m = Pca.secondMoment(emb, "embedding", 64).localCheckpoint(true)
    val (v1, l1) = Pca.topComponent(m, 64)
    val (v2, l2) = Pca.topComponent(m, 64)
    assert(v1.toSeq == v2.toSeq && l1 == l2)
    // second moment along the top component beats every coordinate axis
    val proj = Pca.project(emb, "embedding", v1, "pc1")
      .agg(sum($"pc1" * $"pc1")).as[Double].head()
    val axis0 = emb.select(element_at($"embedding", 1).cast("double").as("x"))
      .agg(sum($"x" * $"x")).as[Double].head()
    assert(proj >= axis0 * 0.999,
      s"top-component moment $proj below axis-0 moment $axis0")
  }
}
