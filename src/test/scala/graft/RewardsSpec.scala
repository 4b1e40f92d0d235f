package graft

import graft.stats.Rewards

/** GRPO group normalization: z-score identities (mean 0 / unit
  * variance within a group), the zero-variance guard, best-of-n
  * uniqueness and tie-breaking, and bit-determinism under
  * repartitioning. */
@org.scalatest.tags.Slow
class RewardsSpec extends SparkSpec {
  import spark.implicits._

  test("advantages are group z-scores: mean ~0, population sd ~1") {
    val df = Seq(
      (1L, 10L, 1.0), (1L, 11L, 2.0), (1L, 12L, 3.0), (1L, 13L, 6.0),
      (2L, 20L, -5.0), (2L, 21L, 5.0))
      .toDF("g", "id", "r")
    val out = Rewards.groupNormalize(df, "g", "r", "id").collect()
    val byG = out.groupBy(_.getAs[Long]("g"))
    byG.foreach { case (_, rows) =>
      val a = rows.map(_.getAs[Double]("advantage"))
      assert(math.abs(a.sum) < 1e-12, "group mean advantage 0")
      assert(math.abs(a.map(x => x * x).sum / a.length - 1.0) < 1e-12,
        "population variance 1")
    }
    // group 2: rewards ±5, sd = 5 → advantages ±1
    val g2 = out.filter(_.getAs[Long]("g") == 2L)
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("advantage")).toMap
    assert(g2(20L) == -1.0 && g2(21L) == 1.0)
  }

  test("zero-variance and singleton groups get advantage 0, still a best") {
    val df = Seq((1L, 1L, 4.0), (1L, 2L, 4.0), (2L, 3L, 9.0))
      .toDF("g", "id", "r")
    val out = Rewards.groupNormalize(df, "g", "r", "id").collect()
    out.foreach(r => assert(r.getAs[Double]("advantage") == 0.0))
    val bests = out.filter(_.getAs[Boolean]("best"))
    assert(bests.map(_.getAs[Long]("g")).toSet == Set(1L, 2L))
    // tie on reward → highest tie-break id wins
    assert(bests.find(_.getAs[Long]("g") == 1L).get.getAs[Long]("id") == 2L)
  }

  test("exactly one best per group; it has the max reward") {
    val df = (0 until 300).map { i =>
      (i % 10L, i.toLong, ((i * 7919) % 100).toDouble)
    }.toDF("g", "id", "r")
    val out = Rewards.groupNormalize(df, "g", "r", "id").collect()
    val byG = out.groupBy(_.getAs[Long]("g"))
    assert(byG.size == 10)
    byG.foreach { case (g, rows) =>
      val bests = rows.filter(_.getAs[Boolean]("best"))
      assert(bests.length == 1, s"group $g: ${bests.length} best rows")
      val maxR = rows.map(_.getAs[Double]("r")).max
      assert(bests.head.getAs[Double]("r") == maxR)
    }
  }

  test("bit-deterministic under repartitioning") {
    val base = (0 until 1000).map { i =>
      (i % 17L, i.toLong, math.sin(i.toDouble) * 100)
    }
    val r1 = Rewards.groupNormalize(base.toDF("g", "id", "r"), "g", "r", "id")
      .orderBy("id").collect().map(_.getAs[Double]("advantage")).toSeq
    val r2 = Rewards.groupNormalize(
        base.toDF("g", "id", "r").repartition(23), "g", "r", "id")
      .orderBy("id").collect().map(_.getAs[Double]("advantage")).toSeq
    assert(r1 == r2)
  }
}
