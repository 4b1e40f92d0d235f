package graft

import graft.queries.Registry
import org.apache.spark.sql.execution.ExplainMode

/** Plan-quality gates for the round-11 stats/eval tail (q298–q307):
  * calendar- and domain-bounded frames land once and broadcast,
  * map-side gate projections reach the scan un-joined, and the
  * single-pass moment reductions stay single-pass.
  */
class Round11StatsPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  private def tree(name: String): Seq[String] =
    plan(name).linesIterator.takeWhile(_.trim.nonEmpty).toSeq

  test("q298: ladder + rank-back ride the LANDED difference frame; ladder broadcasts") {
    val t = tree("q298_wilcoxon_signed_rank")
    assert(t.exists(_.contains("Scan ExistingRDD")) &&
      t.count(_.contains("Scan parquet")) == 0,
      "the paired-difference frame lands once; ladder, zero census and " +
        "rank-back all probe it")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(t.exists(_.contains("BroadcastHashJoin")),
      "the |d| value-domain ladder is bounded — the rank-back must broadcast")
  }

  test("q299/q300: gate/moment projections are map-side — no joins at all") {
    for (q <- Seq("q299_mcnemar_gates", "q300_welch_t_test")) {
      val t = tree(q)
      assert(t.count(_.contains("Scan parquet")) == 1, s"$q: one scan")
      assert(!t.exists(l => l.contains("Join") || l.contains("CartesianProduct")),
        s"$q: 2x2 cells / Welch moments are conditional aggregation, not joins")
    }
  }

  test("q301: moments and residuals probe the LANDED daily frame") {
    val t = tree("q301_durbin_watson")
    assert(t.exists(_.contains("Scan ExistingRDD")) &&
      t.count(_.contains("Scan parquet")) == 0,
      "the daily frame lands once; the moment pass and residual pass probe it")
    assert(!t.exists(_.contains("CartesianProduct")))
  }

  test("q302: the lag spine and daily frames broadcast — no SMJ, no cartesian") {
    val p = plan("q302_cross_correlation")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      "both daily frames and the 8-row lag spine are calendar-bounded")
  }

  test("q303: the weighted pair join rides the LANDED daily frame, bounded not cartesian") {
    val t = tree("q303_ewma_control_chart")
    assert(t.exists(_.contains("Scan ExistingRDD")) &&
      t.count(_.contains("Scan parquet")) == 0,
      "daily lands once; the 40-lag pair join and the moment pass probe it")
    assert(!t.exists(_.contains("CartesianProduct")),
      "the ji in (ti-39, ti] window must plan as BNLJ over bounded days")
  }

  test("q304: vote argmax is one window over the (task x answer) frame") {
    val t = tree("q304_majority_vote")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(t.count(_.trim.startsWith("Window")) <= 1,
      "one per-task vote window; accuracy cells are conditional aggregation")
  }

  test("q305: power sums are ONE scan, no joins") {
    val t = tree("q305_jarque_bera")
    assert(t.count(_.contains("Scan parquet")) == 1)
    assert(!t.exists(l => l.contains("Join") || l.contains("CartesianProduct")))
  }

  test("q306: the whole matrix is ONE scan + one 1-row aggregate") {
    val t = tree("q306_correlation_matrix")
    assert(t.count(_.contains("Scan parquet")) == 1,
      "all 14 moments and 6 cross-products come off a single lineitem scan")
    assert(!t.exists(l => l.contains("Join") || l.contains("CartesianProduct")))
    assert(t.count(_.contains("Exchange")) <= 1,
      "one global-aggregate exchange; the unpivot is a projection")
  }

  test("q307: both split assignments are map-side expressions — no self-join") {
    val t = tree("q307_group_split")
    assert(t.count(_.contains("Scan parquet")) == 1)
    assert(!t.exists(l => l.contains("Join") || l.contains("CartesianProduct")),
      "group- and doc-keyed splits are md5 projections on the same row")
  }

  test("q308/q312: gate/moment projections are map-side — one scan, no joins") {
    for (q <- Seq("q308_cochran_q", "q312_effect_size")) {
      val t = tree(q)
      assert(t.count(_.contains("Scan parquet")) == 1, s"$q: one scan")
      assert(!t.exists(l => l.contains("Join") || l.contains("CartesianProduct")),
        s"$q: cells and pooled moments are conditional aggregation, not joins")
    }
  }

  test("q309: the day-pair join rides the LANDED joined series, bounded not cartesian") {
    val t = tree("q309_kendall_tau_b")
    assert(t.exists(_.contains("Scan ExistingRDD")) &&
      t.count(_.contains("Scan parquet")) == 0,
      "the joined daily frame lands once; pairs and the day count probe it")
    assert(!t.exists(_.contains("CartesianProduct")),
      "the bd > ad pair join is calendar-bounded and must plan as BNLJ")
  }

  test("q310: ladder, median and signs all probe the LANDED daily frame") {
    val t = tree("q310_runs_test")
    assert(t.exists(_.contains("Scan ExistingRDD")) &&
      t.count(_.contains("Scan parquet")) == 0)
    assert(!t.exists(_.contains("CartesianProduct")))
  }

  test("q313: the isotropy census is ONE exploded scan — the pair sum never materializes") {
    val t = tree("q313_isotropy_census")
    assert(t.count(_.contains("Scan parquet")) == 1)
    assert(!t.exists(l => l.contains("Join") || l.contains("CartesianProduct")),
      "the sum-vector identity replaces the n^2 pair join entirely")
  }

  test("q314: the k+1 cut lands once; xk1 broadcasts back onto it") {
    val t = tree("q314_hill_tail_index")
    assert(t.exists(_.contains("Scan ExistingRDD")),
      "the top-(k+1) frame lands once and feeds both the xk1 and term passes")
    assert(t.exists(_.contains("BroadcastHashJoin")),
      "the per-source xk1 frame is bounded — it must broadcast")
    assert(!t.exists(_.contains("SortMergeJoin")))
  }

  test("q315: partials and the direct pass both probe the LANDED base") {
    val t = tree("q315_comoment_merge_law")
    assert(t.exists(_.contains("Scan ExistingRDD")) &&
      t.count(_.contains("Scan parquet")) == 0,
      "the (yr, x, y) base lands once; merged and direct are two probes of it")
    assert(!t.exists(_.contains("CartesianProduct")))
  }

  test("q316: sketch and exact arms are aggregations — no fact-sized join anywhere") {
    val t = tree("q316_join_size_estimate")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(!t.exists(_.contains("SortMergeJoin")),
      "the only join is the 1-row x 1-row scalar cross (BNLJ)")
  }

  test("q317: the (user, day) frame lands once; cohort sizes broadcast onto cells") {
    val t = tree("q317_cohort_retention")
    assert(t.exists(_.contains("Scan ExistingRDD")) &&
      t.count(_.contains("Scan parquet")) == 0,
      "the deduped active frame lands once; first-seen and cells probe it")
    assert(t.exists(_.contains("BroadcastHashJoin")),
      "the calendar-bounded cohort-size frame must broadcast")
    assert(!t.exists(_.contains("CartesianProduct")))
  }

  test("q311: per-language moments broadcast back onto the landed base") {
    val t = tree("q311_grubbs_statistic")
    assert(t.exists(_.contains("Scan ExistingRDD")) &&
      t.count(_.contains("Scan parquet")) == 0,
      "the (lang, x) base lands once; the moment and deviation passes probe it")
    assert(t.exists(_.contains("BroadcastHashJoin")),
      "the per-language moment frame is bounded — it must broadcast")
    assert(!t.exists(_.contains("SortMergeJoin")))
  }
}
