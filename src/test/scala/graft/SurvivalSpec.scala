package graft

import graft.stats.Survival
import org.apache.spark.sql.Row

/** Hand-checked Kaplan–Meier edges: the textbook product-limit values,
  * censoring between steps, survival hitting exactly zero, and the
  * degenerate all-censored input. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def km(rows: Seq[(Long, Boolean)]): Seq[Row] =
    Survival.kaplanMeier(rows.toDF("dur", "observed"), "dur", "observed")
      .collect().toSeq

  test("textbook curve: events and interleaved censoring") {
    // Classic 6-unit example: events at t=1 (d=1 of 6) and t=3 (d=1 of 4),
    // censored at t=2 and t=3; survivors censored at t=4.
    val rows = Seq(
      (1L, true), (2L, false), (3L, true), (3L, false),
      (4L, false), (4L, false))
    val out = km(rows)
    assert(out.map(_.getLong(0)) === Seq(1L, 3L))
    val r1 = out.head
    // t=1: n_risk=6, d=1 → S = 5/6 = 0.833333
    assert(r1.getLong(1) === 6L && r1.getLong(2) === 1L && r1.getLong(3) === 0L)
    assert(math.abs(r1.getDouble(4) - 0.833333) < 1e-6)
    val r3 = out(1)
    // t=3: at risk 4 (one event, one censor left at 1,2), d=1, c=1
    // S = 5/6 · 3/4 = 0.625
    assert(r3.getLong(1) === 4L && r3.getLong(2) === 1L && r3.getLong(3) === 1L)
    assert(math.abs(r3.getDouble(4) - 0.625) < 1e-6)
  }

  test("last step with d = n_risk lands survival exactly at 0") {
    val out = km(Seq((1L, true), (2L, true), (2L, true)))
    assert(out.map(_.getDouble(4)).last === 0.0)
    // first step: S = 2/3
    assert(math.abs(out.head.getDouble(4) - 0.666667) < 1e-6)
  }

  test("all-censored input produces an empty curve") {
    assert(km(Seq((5L, false), (7L, false))).isEmpty)
  }

  test("single observed unit: one step from 1 to 0") {
    val out = km(Seq((4L, true)))
    assert(out.size === 1)
    assert(out.head.getLong(1) === 1L && out.head.getDouble(4) === 0.0)
  }

  test("steps with d = 0 never appear but their censoring shrinks n_risk") {
    val out = km(Seq((1L, false), (2L, true)))
    assert(out.size === 1)
    // the t=1 censored unit already left: n_risk at t=2 is 1
    assert(out.head.getLong(0) === 2L && out.head.getLong(1) === 1L)
    assert(out.head.getDouble(4) === 0.0)
  }
}
