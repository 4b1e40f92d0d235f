package graft

import org.apache.spark.sql.functions._
import graft.stats.{Interpolate, Outliers, Regression}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("MAD bounds: no-op guards for all-zero and zero-MAD groups (reference semantics)") {
    val df = (Seq.fill(5)(("zeros", 0.0)) ++
      Seq.fill(5)(("constant", 7.0)) ++
      Seq(("normal", 1.0), ("normal", 2.0), ("normal", 3.0), ("normal", 4.0),
        ("normal", 1000.0)))
      .toDF("g", "x")
    val b = Outliers.madBoundsLog1p(df, Seq("g"), "x", k = 3.0)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[java.lang.Double]("lower"), r.getAs[java.lang.Double]("upper"))).toMap
    assert(b("zeros")._1 == null, "all-zero group must not produce bounds")
    assert(b("constant")._1 == null, "mad<=0 group must not produce bounds")
    assert(b("normal")._1 != null && b("normal")._2 != null)
  }

  test("MAD flags the planted outlier and nothing else") {
    val df = (Seq.tabulate(20)(i => ("g", 10.0 + i)) :+ (("g", 1e6)))
      .toDF("g", "x")
    val flagged = Outliers.flagOutliers(df, Seq("g"), "x", k = 3.0)
      .filter($"is_outlier").select($"x").as[Double].collect().toSeq
    assert(flagged == Seq(1e6))
  }

  test("Regression recovers exact coefficients on noiseless data") {
    val df = Seq.tabulate(10)(i => ("g", i.toDouble, 3.0 + 2.0 * i)).toDF("g", "x", "y")
    val c = Regression.fit(df, Seq("g"), "x", "y").head()
    assert(math.abs(c.getAs[Double]("slope") - 2.0) < 1e-12)
    assert(math.abs(c.getAs[Double]("intercept") - 3.0) < 1e-12)
  }

  test("Cook's distance singles out the influential point") {
    val df = (Seq.tabulate(20)(i => ("g", i.toDouble, 2.0 * i + (if (i % 2 == 0) 0.1 else -0.1)))
      :+ (("g", 30.0, 0.0))) // far-x, far-off-line point
      .toDF("g", "x", "y")
    val top = Regression.cooksDistance(df, Seq("g"), "x", "y")
      .orderBy(desc("cooksd")).select($"x").as[Double].head()
    assert(top == 30.0)
  }

  test("linear interpolation: interior gap + rule=2 endpoints") {
    val df = Seq(
      ("g", 0L, None: Option[Double]),   // leading gap -> carries 10
      ("g", 1L, Some(10.0)),
      ("g", 2L, None),                   // interior -> 20
      ("g", 4L, Some(40.0)),             // uneven spacing
      ("g", 5L, None)                    // trailing gap -> carries 40
    ).toDF("g", "i", "v")
    val out = Interpolate.linear(df, Seq("g"), "i", "v")
      .orderBy("i").select($"v_filled").as[Double].collect().toSeq
    assert(out == Seq(10.0, 10.0, 20.0, 40.0, 40.0))
  }

  test("boundsCensusAuto: approx census matches the exact flag census; switch respects the threshold") {
    val base = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_returnflag", $"l_extendedprice")
    def census(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      df.select($"l_returnflag", $"n_outliers", $"n")
        .collect().map(r => r.getString(0) -> (r.getAs[Long]("n_outliers"), r.getAs[Long]("n"))).toMap
    val exact = census(Outliers.boundsCensus(base, Seq("l_returnflag"), "l_extendedprice", 2.5))
    val approx = census(Outliers.boundsCensusApprox(base, Seq("l_returnflag"), "l_extendedprice", 2.5))
    assert(exact == approx, s"approx census must not move any flags: $exact vs $approx")
    // the auto switch: tiny threshold -> approx plan (no per-group histogram sort)
    val autoApprox = Outliers.boundsCensusAuto(base, Seq("l_returnflag"), "l_extendedprice", 2.5,
      maxExactRows = 100L)
    assert(!autoApprox.queryExecution.executedPlan.toString.contains("SortPercentile") &&
      census(autoApprox) == exact)
    // generous threshold -> the exact path (oracle semantics at sf0.01)
    val autoExact = Outliers.boundsCensusAuto(base, Seq("l_returnflag"), "l_extendedprice", 2.5)
    assert(census(autoExact) == exact)
  }
}
