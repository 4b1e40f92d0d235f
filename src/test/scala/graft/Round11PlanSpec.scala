package graft

import graft.queries.Registry
import org.apache.spark.sql.execution.ExplainMode

/** Plan-quality gates for the round-11 surface: candidate generation
  * stays postings/equi-join shaped (never all-pairs), calendar- and
  * domain-bounded frames land once and broadcast, and the new exact
  * reductions keep their single-scan shapes. */
class Round11PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  private def tree(name: String): Seq[String] =
    plan(name).linesIterator.takeWhile(_.trim.nonEmpty).toSeq

  test("q284: one global midrank ladder — a single window, no per-group rescans") {
    val p = plan("q284_kruskal_wallis")
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.count(_.trim.startsWith("Window")) <= 1,
      "exactly one value-domain ladder window")
  }

  test("q285: lag probes ride the LANDED daily frame, never raw events") {
    val t = tree("q285_acf_ljung_box")
    assert(t.exists(_.contains("Scan ExistingRDD")),
      "the centered series lands once; den and the lag join probe it")
    assert(!t.exists(_.contains("CartesianProduct")),
      "the i<j lag join is calendar-bounded and must plan as BNLJ, not cartesian")
  }

  test("q286: candidate pairs come from the shared-neighbor postings equi-join") {
    val p = plan("q286_link_prediction")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "pair candidates must equi-join on the shared neighbor")
    assert(p.contains("TopKLocal") || p.contains("TakeOrderedAndProject"),
      "top-20 must be a bounded-heap take, not a global sort")
  }

  test("q287: the class × bin grid is domain-bounded; global cum broadcasts") {
    val p = plan("q287_t_closeness")
    assert(p.contains("BroadcastHashJoin"),
      "the bin-level global cumulative frame must broadcast onto the grid")
    assert(!p.contains("SortMergeJoin"),
      "every join side here is domain-bounded — nothing should SMJ")
  }

  test("q288: min-plus rounds stay equi-join shaped over the node-bounded state") {
    val p = plan("q288_harmonic_centrality")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q289: two pruned scans beat landing a 3-rows-per-fact stack") {
    val t = tree("q289_histogram_profile")
    assert(t.count(_.contains("Scan parquet")) == 2 &&
      !t.exists(_.contains("Scan ExistingRDD")),
      "min/max pass + bucket pass each re-scan the pruned columns — " +
        "materializing 3N stacked rows costs more than the second scan")
    assert(t.exists(_.contains("BroadcastHashJoin")),
      "per-column min/max is a 3-row frame — it must broadcast")
  }

  test("q290: pass@k is one aggregation at the task grain") {
    val t = tree("q290_pass_at_k")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(t.count(_.contains("Exchange")) <= 2,
      "one shuffle to the task grain (plus the ordered output exchange) — " +
        "the unrolled product is a projection, not a join")
  }

  test("q293: digit census is one scan; the chi-square fold rides the landed digit rows") {
    val t = tree("q293_benford_audit")
    assert(t.count(_.contains("Scan parquet")) <= 1,
      "one orders scan builds the 9-digit census; everything after is scalar")
    assert(!t.exists(_.contains("SortMergeJoin")),
      "the only joins are 1-row scalar broadcasts")
  }

  test("q294: both rank ladders broadcast back onto the order grain") {
    val p = plan("q294_spearman_rank")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      "the value-domain ladders are bounded frames — they must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q295: order statistics and masses probe the LANDED ladder, not raw docs") {
    val t = tree("q295_winsorized_mean")
    assert(t.count(_.contains("Scan parquet")) == 0 &&
      t.exists(_.contains("Scan ExistingRDD")),
      "the per-(lang, value) ladder lands once; scalars, bounds and masses probe it")
    assert(!t.exists(_.contains("CartesianProduct")))
  }

  test("q291: S and the tie census probe the LANDED daily frame") {
    val t = tree("q291_mann_kendall")
    assert(t.exists(_.contains("Scan ExistingRDD")) &&
      t.count(_.contains("Scan parquet")) == 0,
      "the daily frame lands once; pair join and tie census probe it")
    assert(!t.exists(_.contains("CartesianProduct")))
  }
}
