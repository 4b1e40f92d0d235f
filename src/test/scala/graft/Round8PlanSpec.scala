package graft

import graft.queries.Registry
import org.apache.spark.sql.execution.ExplainMode

/** Plan-quality gates for the round-8 surface: the properties that
  * make these operators survive a 100× scale-up — candidate
  * generation via equi-joins only (no nested-loop blow-ups), split
  * aggregation arms for the HLL audit, and the scan shapes the
  * docstrings promise. */
class Round8PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("q214: blocking yields equi-joins only — no nested-loop candidate generation") {
    val p = plan("q214_fuzzy_linkage")
    assert(!p.contains("CartesianProduct"), s"cartesian in linkage plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "candidate pairs must come from the blocking equi-join")
    // the pair scoring lives in the LANDED build since r10 (q214 lands
    // the match table, q254/q256 probe it) — gate the build plan
    val b = graft.queries.MiscQueries.jwBlockMatchesBuild(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!b.contains("CartesianProduct") &&
      !b.contains("BroadcastNestedLoopJoin"),
      s"non-equi candidate generation in the landed build:\n$b")
    assert(b.contains("jaro_winkler"), "native kernel missing from build plan")
  }

  test("q206: triangle counting is equi-joins only") {
    val p = plan("q206_triangle_lcc")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q208: sketch and exact-audit arms aggregate separately (no Expand)") {
    val p = plan("q208_hll_cardinality")
    assert(!p.contains("Expand"),
      "distinct+typed-imperative in one groupBy would plan an Expand over 2x rows")
    assert(p.contains("hll_registers"), "native aggregate missing")
  }

  test("q205: alpha's coincidence pairs join on unit, never cross units") {
    val p = plan("q205_krippendorff_alpha")
    assert(!p.contains("CartesianProduct"),
      "within-unit pair expansion must ride the unit equi-join")
  }

  test("q211: isotonic bucket census prunes to the two needed columns") {
    val p = plan("q211_isotonic_calibration")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && !readSchema.contains("text"),
      s"scan should read doc_id only, got: $readSchema")
  }
}
