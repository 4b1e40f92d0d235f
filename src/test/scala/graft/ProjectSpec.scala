package graft

import graft.similarity.Project
import org.apache.spark.sql.functions._

/** JL projection: exact integer projections, the E[ratio]≈1 contract
  * at measured concentration, determinism under repartitioning. */
class ProjectSpec extends SparkSpec {
  import spark.implicits._

  test("projected coordinate equals the hand-computed signed sum") {
    val one = Seq((1L, Array(0.5f, -0.25f, 1.0f))).toDF("vec_id", "embedding")
    val got = Project.projectVectors(one, "vec_id", "embedding", p = 2)
      .select($"proj").as[Seq[Long]].head()
    val e = Seq(5000000L, -2500000L, 10000000L)
    val want = (0 until 2).map(j =>
      e.zipWithIndex.map { case (x, i) => x * Project.sign(j, i) }.sum)
    assert(got == want)
  }

  test("distortion ratio concentrates around 1 on real embeddings") {
    val emb = graft.core.Tables.embeddings(spark, sf).filter($"vec_id" < 40)
    val out = Project.distortionCensus(emb, "vec_id", "embedding", p = 16)
      .select($"n_pairs", $"mean_ratio", $"min_ratio", $"max_ratio")
      .as[(Long, Double, Double, Double)].head()
    val (n, mean, lo, hi) = out
    assert(n == 40L * 39 / 2)
    assert(math.abs(mean - 1.0) < 0.15, s"mean ratio $mean")   // E[r]=1
    assert(lo > 0.2 && hi < 3.0, s"tails [$lo, $hi]")          // p=16 spread
  }

  test("census identical under repartitioning") {
    val emb = graft.core.Tables.embeddings(spark, sf).filter($"vec_id" < 30)
    def run(df: org.apache.spark.sql.DataFrame) =
      Project.distortionCensus(df, "vec_id", "embedding", p = 8).collect().toSeq
    assert(run(emb) == run(emb.repartition(9)))
  }
}
