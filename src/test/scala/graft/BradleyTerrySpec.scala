package graft

import org.apache.spark.sql.functions._
import graft.stats.BradleyTerry

/** Bradley–Terry MM fitting: closed-form two-item case, strength
  * ordering vs win rates on a transitive tournament, normalization and
  * conservation invariants, determinism under repartitioning. */
@org.scalatest.tags.Slow
class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  test("two items: strengths converge toward the win-odds split") {
    // i beats j 3:1 → p_i/(p_i+p_j) should head for 0.75
    val pairs = Seq((0L, 1L, 30L, 10L)).toDF("a", "b", "wa", "wb")
    val r = BradleyTerry.fit(pairs, "a", "b", "wa", "wb", iters = 20)
      .orderBy("item").collect()
    assert(r.length == 2)
    val p0 = r(0).getAs[Double]("strength")
    val p1 = r(1).getAs[Double]("strength")
    // normalization divides by the DECIMAL(38,6)-routed sum, so the
    // renormalized strengths sum to 1 only within the 6-dp rounding
    assert(math.abs(p0 + p1 - 1.0) < 1e-6, "strengths normalized")
    assert(math.abs(p0 / (p0 + p1) - 0.75) < 1e-6,
      s"two-item MLE is the empirical win rate, got ${p0 / (p0 + p1)}")
  }

  test("transitive tournament: strength order follows dominance") {
    // 0 > 1 > 2 with consistent margins
    val pairs = Seq(
      (0L, 1L, 70L, 30L),
      (1L, 2L, 70L, 30L),
      (0L, 2L, 85L, 15L)).toDF("a", "b", "wa", "wb")
    val r = BradleyTerry.fit(pairs, "a", "b", "wa", "wb", iters = 30)
      .collect().map(x => x.getAs[Long]("item") -> x.getAs[Double]("strength"))
      .toMap
    assert(r(0L) > r(1L) && r(1L) > r(2L), s"dominance order violated: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-6) // 6-dp decimal routing
  }

  test("wins/games bookkeeping and zero-win items stay in the table") {
    val pairs = Seq(
      (0L, 1L, 10L, 0L),
      (1L, 2L, 5L, 5L)).toDF("a", "b", "wa", "wb")
    val r = BradleyTerry.fit(pairs, "a", "b", "wa", "wb", iters = 5)
      .collect().map(x => (x.getAs[Long]("item"),
        x.getAs[Double]("wins"), x.getAs[Double]("games"))).sortBy(_._1)
    assert(r.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(r(0)._2 == 10.0 && r(0)._3 == 10.0)
    assert(r(1)._2 == 5.0 && r(1)._3 == 20.0)
    assert(r(2)._2 == 5.0 && r(2)._3 == 10.0)
  }

  test("bit-deterministic under repartitioning (decimal-routed sums)") {
    val base = (0 until 500).map { i =>
      val a = i % 7L; val b = (i % 11L) + 7L
      (a, b, (i % 5).toLong + 1L, (i % 3).toLong)
    }
    val df1 = base.toDF("a", "b", "wa", "wb")
    val df2 = base.toDF("a", "b", "wa", "wb").repartition(13)
    val r1 = BradleyTerry.fit(df1.groupBy("a", "b")
        .agg(sum("wa").as("wa"), sum("wb").as("wb")),
        "a", "b", "wa", "wb", iters = 4)
      .orderBy("item").collect().map(_.getAs[Double]("strength")).toSeq
    val r2 = BradleyTerry.fit(df2.groupBy("a", "b")
        .agg(sum("wa").as("wa"), sum("wb").as("wb")),
        "a", "b", "wa", "wb", iters = 4)
      .orderBy("item").collect().map(_.getAs[Double]("strength")).toSeq
    assert(r1 == r2, "strengths must be bit-identical at any parallelism")
  }
}
