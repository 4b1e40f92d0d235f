package graft

import graft.queries.Registry
import org.apache.spark.sql.execution.ExplainMode

/** Plan-quality gates for the round-9 surface: the properties that
  * make these operators survive a 100× scale-up — suffix-order
  * adjacency instead of all-pairs comparison, sketch-algebra rollups
  * that never rescan raw rows, broadcast lookups for bounded fit
  * frames, and cross products confined to label-sized frames. */
class Round9PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("q216: rank-adjacency LCP pairs ride equi-joins — never all-pairs") {
    val p = plan("q216_sa_lcp_mining")
    assert(!p.contains("CartesianProduct"), "suffix pairs must come from rank adjacency")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q217: holdout lookup is one broadcast hash join; scans never read text") {
    val p = plan("q217_isotonic_apply")
    assert(p.contains("BroadcastHashJoin LeftOuter"),
      "the applier must broadcast the bounded step table, one hash probe per score")
    assert(!p.contains("CartesianProduct"))
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty && schemas.forall(!_.contains("text")),
      s"every scan must prune to doc_id: $schemas")
  }

  test("q218: coincidence pairs ride the unit equi-join; cross products confined to broadcast-bounded label frames") {
    val p = plan("q218_krippendorff_ordinal")
    assert(p.linesIterator.exists(l => l.contains("Left keys") && l.contains("unit")),
      "within-unit pair expansion must equi-join on unit")
    // δ²(c,k) needs all label pairs — a cartesian, but of the LABEL
    // frame (≤ S² rows). Proof of boundedness: inside each cartesian's
    // subtree, a blocking aggregation appears before any parquet scan
    // (the inputs are label marginals, never raw rating rows).
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toVector
    def indent(l: String): Int = l.indexOf("+-") match {
      case -1 => l.length; case i => i
    }
    tree.zipWithIndex.filter(_._1.contains("CartesianProduct")).foreach { case (l, i) =>
      val d = indent(l)
      val subtree = tree.drop(i + 1).takeWhile(indent(_) > d)
      val firstScan = subtree.indexWhere(_.contains("Scan parquet"))
      val firstAgg = subtree.indexWhere(x =>
        x.contains("HashAggregate") || x.contains("Window"))
      assert(firstAgg >= 0 && (firstScan < 0 || firstAgg < firstScan),
        s"cartesian over un-aggregated rows (must be the bounded label frame):\n$l\n${subtree.take(6).mkString("\n")}")
    }
  }

  test("q219: pooled-quantile lookups are equi-joins; no per-rater cross products") {
    val p = plan("q219_quantile_normalize")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q220: coverage census is two map-side-combined shuffles over one pruned scan") {
    val p = plan("q220_vocab_coverage")
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    assert(tree.count(_.contains("Exchange")) == 2,
      s"token census + frequency-of-frequencies = exactly 2 shuffles:\n${tree.mkString("\n")}")
    assert(tree.count(_.contains("Scan parquet")) == 1, "one scan feeds both censuses")
    val rs = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!rs.contains("doc_id"), s"scan must prune to (lang, text): $rs")
  }

  test("q221/q223: suffix-run spans ride equi-joins — never all-pairs") {
    for (n <- Seq("q221_sa_span_dedup", "q223_sa_contamination")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), n)
      assert(!p.contains("BroadcastNestedLoopJoin"), n)
    }
  }

  test("q222: rollup grains consume merged registers — no rebuild from raw rows") {
    val p = plan("q222_hll_rollup")
    assert(p.contains("hll_merge"), "merge aggregate missing from the rollup plan")
    assert(!p.contains("hll_registers"),
      "coarser grains must max-merge the fine registers, never rescan the data")
    assert(!p.contains("Expand"))
  }

  test("q226: assignment is map-only — no join, no window, one codegen'd pass") {
    val p = plan("q226_kcenter_coreset")
    assert(!p.contains("Join"), "centers are literals; assignment must not join")
    assert(!p.contains("Window"), "argmin must be array_min, not a per-id window")
  }

  test("q235: grouped weighted sample plans the bounded per-key heap, not a full sort") {
    val p = plan("q235_grouped_weighted_sample")
    assert(p.contains("TopKLocal") && p.contains("TopKFinal"),
      s"the rank-filter rewrite must fire:\n$p")
    assert(!p.contains("Window"), "no per-group full sort")
  }

  test("q224/q229/q230: model joins and candidate generation are equi-joins — never all-pairs") {
    for (n <- Seq("q224_kneser_ney_lm", "q229_incremental_cdc",
        "q230_prefix_jaccard")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), n)
    }
    // q230 specifically: candidates must come from the prefix postings
    // equi-join, not a nested-loop pass over the corpus
    assert(!plan("q230_prefix_jaccard").contains("BroadcastNestedLoopJoin"))
  }

  test("q242/q243: walk-derived pair joins are equi-keyed; no cartesian anywhere") {
    for (n <- Seq("q242_skipgram_pairs", "q243_negative_samples")) {
      assert(!plan(n).contains("CartesianProduct"), n)
    }
  }

  test("q245: six-column profile is ONE scan, one aggregation, no Expand") {
    val p = plan("q245_table_profile")
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    assert(!p.contains("Expand"),
      "multi-column distinct must ride sketches, not an Expand blowup")
    assert(tree.count(_.contains("Scan parquet")) == 1, "one pass over the table")
  }

  test("q227/q228: CM and KMV rollups merge fine states — no rebuild from raw rows") {
    val cm = plan("q227_cm_rollup")
    assert(cm.contains("cm_merge") && !cm.contains("count_min("),
      "the coarse grain must add the fine counters, never rescan the log")
    val kmv = plan("q228_kmv_rollup")
    assert(kmv.contains("kmv_merge") && !kmv.contains("k_min_hashes"),
      "the coarse grain must re-cap the fine k-minima, never rescan the log")
  }
}
