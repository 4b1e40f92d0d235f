package graft

import graft.core.Tables
import graft.operators.Sampling
import graft.stats.Conformal
import org.apache.spark.sql.functions._

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("conformal rank picks the exact order statistic and coverage counts boundary hits") {
    // group g: 9 calibration residuals 1..9 → k = ⌈10·0.9⌉ = 9 → qhat = 9
    val rows =
      (1 to 9).map(i => ("g", i.toDouble, 0.0, true)) ++
        Seq(("g", 5.0, 0.0, false),  // |5-0|=5  ≤ 9 covered
            ("g", 9.0, 0.0, false),  // boundary |9| ≤ 9 covered
            ("g", 10.0, 0.0, false)) // |10| > 9 not covered
    val df = rows.toDF("grp", "y", "yhat", "cal")
    val out = Conformal.splitConformal(df, "grp", $"y", $"yhat", $"cal")
      .select($"grp", $"n_cal", $"n_test", $"qhat", $"coverage")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out.toSeq == Seq(("g", 9L, 3L, 9.0, math.rint(2.0 / 3.0 * 1e6) / 1e6)))
  }

  test("groups whose calibration set is smaller than the rank get NULL qhat = infinite interval") {
    // 5 calibration rows → k = ⌈6·0.9⌉ = 6 > 5 → no finite qhat, all covered
    val rows = (1 to 5).map(i => ("tiny", i.toDouble, 0.0, true)) ++
      Seq(("tiny", 1000.0, 0.0, false), ("tiny", 1.0, 0.0, false))
    val out = Conformal.splitConformal(rows.toDF("grp", "y", "yhat", "cal"),
        "grp", $"y", $"yhat", $"cal")
      .select($"qhat".isNull, $"coverage").as[(Boolean, Double)].collect()
    assert(out.toSeq == Seq((true, 1.0)))
  }

  test("test-only groups are dropped (no calibration → no guarantee to report)") {
    val rows = Seq(("a", 1.0, 0.0, true), ("a", 1.0, 0.0, false),
      ("orphan", 1.0, 0.0, false))
    val grps = Conformal.splitConformal(rows.toDF("grp", "y", "yhat", "cal"),
        "grp", $"y", $"yhat", $"cal")
      .select($"grp").as[String].collect().toSet
    assert(grps == Set("a"))
  }

  test("calibration-only groups are dropped too (no test rows → no coverage to audit)") {
    val rows = Seq(("a", 1.0, 0.0, true), ("a", 1.0, 0.0, false),
      ("calonly", 1.0, 0.0, true))
    val grps = Conformal.splitConformal(rows.toDF("grp", "y", "yhat", "cal"),
        "grp", $"y", $"yhat", $"cal")
      .select($"grp").as[String].collect().toSet
    assert(grps == Set("a"))
  }

  test("per-language coverage on real documents meets the 1-alpha guarantee within sampling noise") {
    val docs = Tables.documents(spark, sf)
      .withColumn("yhat", (size(split(trim($"text"), "\\s+")) * 6).cast("double"))
    val out = Conformal.splitConformal(docs, "lang", $"n_chars", $"yhat",
        isCalib = Sampling.hashUnit($"doc_id", "conf") < 0.5)
      .select($"lang", $"n_test", $"coverage").as[(String, Long, Double)].collect()
    assert(out.nonEmpty)
    // finite-sample: E[coverage] ≥ 0.9; allow 3σ binomial slack per group
    out.foreach { case (lang, nTest, cov) =>
      val slack = 3 * math.sqrt(0.9 * 0.1 / nTest)
      assert(cov >= 0.9 - slack, s"$lang coverage $cov below guarantee band (n=$nTest)")
    }
    val mean = out.map(_._3).sum / out.length
    assert(mean >= 0.85, s"mean coverage $mean suspiciously low")
  }

  test("alpha validation rejects degenerate rationals") {
    val df = Seq(("g", 1.0, 0.0, true)).toDF("grp", "y", "yhat", "cal")
    intercept[IllegalArgumentException] {
      Conformal.splitConformal(df, "grp", $"y", $"yhat", $"cal", alphaNum = 0)
    }
    intercept[IllegalArgumentException] {
      Conformal.splitConformal(df, "grp", $"y", $"yhat", $"cal", alphaNum = 10, alphaDen = 10)
    }
  }
}
