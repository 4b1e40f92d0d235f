package graft

import graft.queries.Registry
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan quality gates: the properties that make these plans
  * survive a 100× scale-up — filter/column pushdown into the parquet
  * scan, broadcast joins for dimension tables, whole-stage codegen on
  * the hot paths. A regression here won't fail correctness, so it's
  * asserted explicitly.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("q02: predicates are pushed into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:"), "no pushdown section")
    assert(p.contains("GreaterThan(o_totalprice,1000.0)"), s"price filter not pushed:\n$p")
    assert(p.contains("In(o_orderstatus"), "IN-list not pushed")
  }

  test("q01: column pruning reaches the scan (no unread columns)") {
    val p = plan("q01_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unused column read: $readSchema")
    assert(readSchema.contains("l_quantity"))
  }

  test("q04/q05: dimension joins broadcast; no shuffle for the dim side") {
    assert(plan("q04_broadcast_dim_join").contains("BroadcastHashJoin"))
    val p5 = plan("q05_multiway_join")
    assert(p5.contains("BroadcastHashJoin"), "dims must broadcast")
  }

  test("q01: aggregation runs inside whole-stage codegen") {
    // AQE plans only carry codegen annotations once finalized — execute,
    // then inspect the adaptive plan's final form
    val df = Registry.byName("q01_pricing_summary").run(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark WholeStageCodegen stages in the plan string
    assert(p.contains("*(1)") && p.contains("HashAggregate"),
      s"hot path fell out of codegen:\n$p")
  }

  test("q11: one exchange serves the whole window + aggregation chain") {
    val p = plan("q11_window_lead_gap")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // lead() partitions by user_id; the final groupBy(user_id) must
    // reuse that partitioning instead of re-shuffling
    assert(exchanges <= 1, s"window + groupBy should share one exchange, saw $exchanges:\n$p")
  }

  test("q01: aggregation is map-side partial before the exchange") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_"),
      s"no partial aggregation (map-side combine missing):\n$p")
  }

  test("q52: as-of join never degenerates into a pair join") {
    val p = plan("q52_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of join fell back to a pair join:\n$p")
    assert(p.contains("Window"), "union-sort as-of plan should use a window")
  }
}
