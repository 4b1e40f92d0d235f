package graft

import graft.stats.Fdr
import org.apache.spark.sql.functions._

class FdrSpec extends SparkSpec {
  import spark.implicits._

  private def run(ps: Seq[Long], den: Long, aNum: Long, aDen: Long) =
    Fdr.benjaminiHochberg(
        ps.zipWithIndex.map { case (p, i) => (s"h$i", p) }.toDF("h", "p_num"),
        Seq("h"), col("p_num"), lit(den), aNum, aDen)
      .select($"h", $"rank", $"rejected")
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("textbook step-up: a later rank can rescue an earlier miss") {
    // p = .01 .04 .03 .20 .50 at alpha = 1/4, m = 5: thresholds i/20 =
    // .05 .10 .15 .20 .25 — p(4) = .20 ≤ .20, so k* = 4 rejects the
    // first FOUR sorted p-values (including .20), not just the ones
    // individually below threshold.
    val out = run(Seq(1, 4, 3, 20, 50), den = 100, aNum = 1, aDen = 4)
    assert(out("h0") == ((1L, true)))
    assert(out("h2") == ((2L, true)))
    assert(out("h1") == ((3L, true)))
    assert(out("h3") == ((4L, true)), "step-up rescues p=.20 at rank 4")
    assert(out("h4") == ((5L, false)))
  }

  test("nothing satisfies: zero rejections, ranks still assigned") {
    val out = run(Seq(90, 80, 70), den = 100, aNum = 1, aDen = 20)
    assert(out.values.forall(!_._2))
    assert(out.values.map(_._1).toSet == Set(1L, 2L, 3L))
  }

  test("all-zero p-values reject everything; ties break on the tie column") {
    val out = run(Seq(0, 0, 0), den = 32, aNum = 1, aDen = 100)
    assert(out.values.forall(_._2))
    assert(out("h0")._1 == 1L && out("h1")._1 == 2L && out("h2")._1 == 3L)
  }

  test("cross-multiplied boundary is exact where double thresholds would wobble") {
    // p = 1/3 vs threshold 1·(1/3): 1·1·3 ≤ 1·1·3 holds exactly.
    val out = Fdr.benjaminiHochberg(
        Seq(("a", 1L)).toDF("h", "p_num"), Seq("h"),
        col("p_num"), lit(3L), alphaNum = 1, alphaDen = 3)
      .select($"rejected").as[Boolean].collect()
    assert(out.sameElements(Array(true)))
  }

  test("mixed denominators rank by the true fraction") {
    // 3/64 < 2/32 (= 4/64): ranks must follow fractions, not numerators
    val df = Seq(("x", 2L, 32L), ("y", 3L, 64L)).toDF("h", "p_num", "p_den")
    val out = Fdr.benjaminiHochberg(df, Seq("h"),
        col("p_num"), col("p_den"), 1, 2)
      .select($"h", $"rank").as[(String, Long)].collect().toMap
    assert(out("y") == 1L && out("x") == 2L)
  }
}
