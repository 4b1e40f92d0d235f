package graft

import graft.stats.Drift
import org.apache.spark.sql.functions._

/** PSI / Jensen-Shannon drift census: identical snapshots score zero,
  * disjoint buckets take the eps-floored finite penalty, JS stays
  * bounded, and results are partitioning-invariant. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (String, Long)*) =
    rows.toDF("lang", "band")

  test("identical snapshots: psi = js = 0 on every bucket") {
    val a = frame(("en", 1L), ("en", 1L), ("de", 2L), ("fr", 3L))
    val out = Drift.census(a, a, Seq("lang", "band"))
      .select($"psi_contrib", $"js_contrib").as[(Double, Double)].collect()
    assert(out.nonEmpty && out.forall { case (p, j) =>
      math.abs(p) < 1e-12 && math.abs(j) < 1e-12 })
  }

  test("a one-sided bucket gets the eps floor, not infinity; JS bounded by ln 2") {
    val ref = frame(("en", 1L), ("en", 1L))
    val cur = frame(("en", 1L), ("de", 9L)) // 'de' absent from ref
    val out = Drift.census(ref, cur, Seq("lang", "band"))
      .select($"lang", $"n_ref", $"n_cur", $"share_ref", $"psi_contrib", $"js_contrib")
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val de = out("de")
    assert(de._2 == 0L && de._3 == 1L)
    assert(de._4 == 1e-6, "absent bucket share floors at eps")
    assert(de._5.isFinite && de._5 > 0, "PSI penalty finite and positive")
    assert(de._6.isFinite && de._6 > 0 && de._6 <= math.log(2) / 2 + 1e-12,
      "per-bucket JS contribution bounded")
    // mass shifting away from 'en' also registers there
    assert(out("en")._5 > 0)
  }

  test("partitioning-invariant and symmetric-in-JS") {
    val ref = frame(Seq.tabulate(60)(i => ("l" + i % 4, (i % 7).toLong)): _*)
    val cur = frame(Seq.tabulate(80)(i => ("l" + i % 5, (i % 6).toLong)): _*)
    def run(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Drift.census(a, b, Seq("lang", "band"))
        .select($"lang", $"band", $"psi_contrib", $"js_contrib")
        .as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(ref, cur) == run(ref.repartition(7), cur.repartition(3)))
    // JS is symmetric: swapping snapshots preserves js_contrib per bucket
    val fwd = run(ref, cur).map(r => (r._1, r._2) -> r._4).toMap
    val bwd = run(cur, ref).map(r => (r._1, r._2) -> r._4).toMap
    assert(fwd.keySet == bwd.keySet)
    fwd.foreach { case (k, v) => assert(math.abs(v - bwd(k)) < 1e-12) }
  }
}
