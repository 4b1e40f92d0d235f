package graft

import graft.queries.Registry
import org.apache.spark.sql.execution.ExplainMode

/** Plan-quality gates for the round-11 extension tail (q322–q342):
  * grid candidate joins stay equi-joins, landed frames are probed not
  * rebuilt, pair work stays calendar/bucket-bounded, and the one
  * permitted nested-loop shape is the 1-row scalar broadcast.
  */
class Round11PlanSpec2 extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  private def tree(name: String): Seq[String] =
    plan(name).linesIterator.takeWhile(_.trim.nonEmpty).toSeq

  test("q322: KM recurrence runs on the duration frame — no cartesian, no SMJ") {
    val t = tree("q322_kaplan_meier")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(!t.exists(_.contains("SortMergeJoin")),
      "the only join is the 1-row horizon broadcast")
  }

  test("q323: touch↔conversion pairing is a user-keyed join, never a product") {
    val t = tree("q323_touch_attribution")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(!t.exists(_.contains("BroadcastNestedLoopJoin")),
      "the time band is a residual filter on the user_id equi-join")
  }

  test("q328: DBSCAN candidates ride the grid equi-join") {
    val t = tree("q328_grid_dbscan")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(!t.exists(_.contains("BroadcastNestedLoopJoin")),
      "pair candidates must come from the 9-cell equi-join, never a product")
  }

  test("q338: the incremental arm probes the landed index, same equi-join shape") {
    val t = tree("q338_incremental_dbscan")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(!t.exists(_.contains("BroadcastNestedLoopJoin")))
    assert(t.exists(_.contains("Scan ExistingRDD")),
      "the landed base artifacts (degrees/edges) are probed, not rebuilt")
  }

  test("q329: both hops are equi-joins on (user, position) — no banded self-join") {
    val t = tree("q329_sequence_patterns")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(!t.exists(_.contains("BroadcastNestedLoopJoin")),
      "successors come from lead(); the second hop equi-joins on position")
  }

  test("q330: one fact pass lands the transition counts; chains probe it") {
    val t = tree("q330_markov_attribution")
    assert(t.count(_.contains("Scan parquet")) == 0,
      "the landed counts frame feeds all five chains — no re-scan of events")
    assert(t.exists(_.contains("Scan ExistingRDD")))
    assert(!t.exists(_.contains("CartesianProduct")))
  }

  test("q336: mixing census probes the landed edge list") {
    val t = tree("q336_graph_mixing")
    assert(t.count(_.contains("Scan parquet")) == 0)
    assert(!t.exists(_.contains("CartesianProduct")))
  }

  test("q337: triplet candidates are same-cell equi-joins on the landed points") {
    val t = tree("q337_triplet_mining")
    assert(t.count(_.contains("Scan parquet")) == 0,
      "both pair arms probe the landed cell-keyed points")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(!t.exists(_.contains("BroadcastNestedLoopJoin")))
  }

}
