package graft

import graft.stats.Calibration
import org.apache.spark.sql.functions._

/** Reliability census on hand-checked frames: a perfectly calibrated
  * score has zero gap, a constant-score miscalibrated one carries the
  * whole ECE, edges bucket deterministically, ECE sums the
  * contributions. */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("perfectly calibrated scores have zero gap everywhere") {
    // bucket 2 (score .25): 1 of 4 positive; bucket 7 (.75): 3 of 4
    val df = (Seq.fill(3)((0.25, 0)) ++ Seq.fill(1)((0.25, 1)) ++
      Seq.fill(1)((0.75, 0)) ++ Seq.fill(3)((0.75, 1))).toDF("score", "label")
    val out = Calibration.census(df, "score", "label")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(2L, 7L))
    assert(out(2L)._5 == 0.0 && out(7L)._5 == 0.0)
    assert(out.values.map(_._6).sum == 0.0)
  }

  test("miscalibration surfaces as gap and ECE; score 1.0 folds into the top bucket") {
    val df = (Seq.fill(10)((0.9, 0)) ++ Seq.fill(10)((1.0, 1))).toDF("score", "label")
    val out = Calibration.census(df, "score", "label")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    // all 20 rows land in bucket 9 (1.0 folds in), conf .95, acc .5
    assert(out.length == 1 && out.head._1 == 9L && out.head._2 == 20L)
    assert(out.head._3 == 0.95 && out.head._4 == 0.5)
    assert(math.abs(out.head._5 - 0.45) < 1e-9)
    assert(math.abs(out.head._6 - 0.45) < 1e-9) // single bucket: ECE = gap
  }

  test("ECE is the n-weighted gap sum; partitioning invariant") {
    val df = (Seq.fill(30)((0.1, 0)) ++ Seq.fill(10)((0.1, 1)) ++ // gap .15, w .8
      Seq.fill(10)((0.65, 1))).toDF("score", "label")             // gap .35, w .2
    def ece(d: org.apache.spark.sql.DataFrame) =
      Calibration.census(d, "score", "label")
        .agg(sum($"ece_contrib")).as[Double].head()
    assert(math.abs(ece(df) - (0.8 * 0.15 + 0.2 * 0.35)) < 1e-6)
    assert(ece(df) == ece(df.repartition(7)))
  }

  test("rocAuc: perfect separation = 1, reversed = 0, ties average, empty class = NULL") {
    def auc(rows: Seq[(Double, Int)]): java.lang.Double =
      Calibration.rocAuc(rows.toDF("score", "label"), "score", "label")
        .select($"auc".as[java.lang.Double]).head()
    assert(auc(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))) == 1.0)
    assert(auc(Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1))) == 0.0)
    // all scores tied: AUC must be exactly 0.5 by tie-averaging
    assert(auc(Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0))) == 0.5)
    assert(auc(Seq((0.5, 1), (0.6, 1))) == null, "undefined without negatives")
    // hand-checked mixed case: scores .1(0) .4(1) .4(0) .9(1)
    // ranks: 1, avg(2,3)=2.5 each, 4 -> rsum = 2.5 + 4 = 6.5
    // auc = (6.5 - 2*3/2) / (2*2) = 3.5/4 = 0.875
    assert(auc(Seq((0.1, 0), (0.4, 1), (0.4, 0), (0.9, 1))) == 0.875)
  }

  test("rocAuc is partitioning-invariant (tie-averaged, never tie-broken)") {
    val df = (1 to 500).map(i => ((i % 13).toDouble / 13.0, i % 3 min 1)).toDF("score", "label")
    def run(d: org.apache.spark.sql.DataFrame) =
      Calibration.rocAuc(d, "score", "label").select($"auc").as[Double].head()
    assert(run(df) == run(df.repartition(11)))
  }
}
