package graft

import graft.queries.Registry
import org.apache.spark.sql.execution.ExplainMode

/** Plan-quality gates for the round-10 surface: the properties that
  * make these operators survive a 100× scale-up — bucket-local ANN
  * candidate joins, broadcast-bounded conformal/decay lookups,
  * sketch rollups that never rescan rows, and map-only tokenizer/
  * decay projections with a single aggregation. */
class Round10PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  /** The operator tree only (formatted explain repeats node names in
    * the details section below the tree). */
  private def tree(name: String): Seq[String] =
    plan(name).linesIterator.takeWhile(_.trim.nonEmpty).toSeq

  test("q257: multi-probe candidates ride the bucket equi-join; probes broadcast") {
    val p = plan("q257_multiprobe_lsh")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "probe buckets must equi-join corpus buckets, never nested-loop")
    assert(p.contains("BroadcastHashJoin"),
      "the query-side probe set is the small side — it must broadcast")
  }

  test("q258: conformal q-hat and group counts broadcast onto the test side") {
    val p = plan("q258_conformal_intervals")
    assert(!p.contains("CartesianProduct"))
    // one rank window over calibration rows only — not over the corpus
    assert(p.linesIterator.count(_.trim.startsWith("Window")) <= 1,
      "exactly one rank window (calibration residuals)")
    assert(p.contains("BroadcastHashJoin"),
      "per-group q-hat is a bounded frame — it must broadcast onto test rows")
  }

  test("q260: KLL rollup consumes the LANDED fine frame — raw rows never rescanned, no Expand") {
    val t = tree("q260_kll_rollup")
    // the fine states land once (lazy checkpoint → ExistingRDD); both
    // grains consume states, so no parquet scan survives in the plan
    assert(t.count(_.contains("Scan parquet")) == 0,
      "the all grain must merge states, never rescan documents")
    assert(t.exists(_.contains("Scan ExistingRDD")), "fine states must be landed")
    assert(!t.exists(_.contains("Expand")), "no q208-trap width explosion")
  }

  test("q262: tokenizer census is map-only into one aggregation — no joins, one scan") {
    val t = tree("q262_bpe_encode")
    assert(!t.exists(_.contains("Join")), "encode is per-row work + one groupBy")
    assert(t.count(_.contains("Scan parquet")) == 1)
  }

  test("q263: decay weights are map-only; the reference date is a 1-row broadcast") {
    val p = plan("q263_decayed_trends")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin Cross") ||
      p.contains("BroadcastHashJoin"),
      "the max-date scalar must reach rows via broadcast, never a shuffle cross")
    // the scalar-aggregate cross is the legitimate 1-row pattern; the
    // fact-side plan stays scan → project → aggregate
    assert(!p.contains("SortMergeJoin"), "no shuffled join anywhere in a decay census")
    assert(!p.contains("Window"))
  }

  test("q261: frozen-centroid assignment is shuffle-free on the corpus side") {
    val p = plan("q261_incremental_ivf")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "cell probes must equi-join cell assignments")
  }
}
