package graft

import graft.queries.Registry
import org.apache.spark.sql.execution.ExplainMode

/** Plan-quality gates for the round-11 extension tail (q364–q382):
  * vocabulary-sized tables shuffle instead of broadcasting, bounded
  * grids/params broadcast instead of shuffling, candidate joins stay
  * equi-joins, landed artifacts are probed not rebuilt, and iteration
  * cost stays independent of the fact scan.
  */
class Round11PlanSpec3 extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  private def tree(name: String): Seq[String] =
    plan(name).linesIterator.takeWhile(_.trim.nonEmpty).toSeq

  test("q364: the (lang, token) likelihood join shuffles — no corpus-growing broadcast") {
    // q364's own plan probes the landed score grid; the join-shape gate
    // belongs on the grid's BUILD plan
    val t = graft.queries.CorpusStatQueries.nbScoreGridBuild(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
      .linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    assert(!t.exists(_.contains("CartesianProduct")))
    // the L-bounded language grid broadcasts (BNLJ on a scalar frame is
    // fine); the vocabulary-sized cnt table must NOT be broadcast — it
    // arrives via a shuffled equi-join on (ml, w)
    assert(t.exists(l => l.contains("SortMergeJoin") ||
      l.contains("ShuffledHashJoin")),
      "likelihood lookup must be a shuffle join, not a broadcast")
    val q = tree("q364_naive_bayes_langid")
    assert(q.exists(_.contains("Scan ExistingRDD")),
      "q364 itself reads the landed grid it produces")
  }

  test("q365: stump search is one binned pass — only bounded broadcasts join") {
    val t = tree("q365_decision_stump")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(!t.exists(_.contains("SortMergeJoin")),
      "rng/totals are feature-bounded broadcasts; nothing shuffles as a join")
  }

  test("q366/q367: causal estimators join only scalar broadcasts") {
    for (q <- Seq("q366_diff_in_differences", "q367_regression_discontinuity")) {
      val t = tree(q)
      assert(!t.exists(_.contains("CartesianProduct")), q)
      assert(!t.exists(_.contains("SortMergeJoin")),
        s"$q: the calendar/range scalars broadcast")
    }
  }

  test("q368/q369: density estimation joins the COMPRESSED histogram, grid broadcast") {
    for (q <- Seq("q368_kde_silverman", "q369_gmm_em")) {
      val t = tree(q)
      assert(!t.exists(_.contains("CartesianProduct")), q)
      assert(t.exists(_.contains("BroadcastHashJoin")),
        s"$q: the bounded grid/params side must broadcast onto the histogram")
    }
  }

  test("q370: F-S weights probe the landed q214 match table") {
    val t = tree("q370_fellegi_sunter")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(t.exists(_.contains("Scan ExistingRDD")),
      "the M-set labels come from the landed jw-matches artifact")
  }

  test("q372: ALS broadcasts the item side; no product shapes") {
    val t = tree("q372_als_factorization")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(t.exists(_.contains("BroadcastHashJoin")),
      "the bounded item-factor side must broadcast")
    // the user-factor join is fact-keyed: at test SF the stats make it
    // a broadcast too (correct — the solve frame IS small here); at
    // scale the same equi-join shuffles. The gate is that it stays an
    // EQUI-join — no nested-loop fallback ever
    assert(!t.exists(_.contains("BroadcastNestedLoopJoin")))
  }

  test("q373: power iteration probes the landed transition matrix — one fact scan") {
    val t = tree("q373_stationary_entropy")
    assert(t.count(_.contains("Scan parquet")) == 0,
      "all iteration steps + the entropy pass read the checkpointed P, " +
        "never the events scan")
    assert(t.exists(_.contains("Scan ExistingRDD")))
  }

  test("q374: Shapley marginals ride the 2^k-bounded landed value frame") {
    val t = tree("q374_shapley_attribution")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(t.exists(_.contains("Scan ExistingRDD")),
      "v(S) and v(S∪c) probe the landed coalition-value frame")
  }

  test("q377: the best-of-n curve is one window + one aggregation — no joins") {
    val t = tree("q377_best_of_n_curve")
    assert(!t.exists(_.contains("Join")),
      "all four n arms ride the same ranked pass; no join anywhere")
  }

  test("q378: Cox moments make exactly one pass over events") {
    val t = tree("q378_cox_score_test")
    assert(t.count(_.contains("Scan parquet")) == 1)
    assert(!t.exists(_.contains("CartesianProduct")))
  }

  test("q380: off-policy estimators join only bounded broadcasts") {
    val t = tree("q380_offpolicy_ips")
    assert(!t.exists(_.contains("CartesianProduct")))
    assert(!t.exists(_.contains("SortMergeJoin")),
      "policies/propensities/totals are action-bounded broadcasts")
  }

  test("q381: caliper matching is a bucket equi-join, never treated×control") {
    val t = tree("q381_caliper_matching")
    assert(!t.exists(_.contains("CartesianProduct")))
    // the two 1-row census scalars broadcast as nested loops (fine);
    // the candidate pairing itself must be a hash equi-join on the
    // caliper bucket
    assert(t.count(_.contains("BroadcastNestedLoopJoin")) <= 2,
      "only the two scalar census crosses may nested-loop")
    assert(t.exists(l => l.contains("BroadcastHashJoin") ||
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")),
      "treated->control candidates ride the bucket equi-join")
  }

  test("q382: fold-in probes the landed item factors, no sweep re-run") {
    val t = tree("q382_als_fold_in")
    assert(t.exists(_.contains("Scan ExistingRDD")),
      "the frozen factor table is a landed artifact probe")
    assert(!t.exists(_.contains("CartesianProduct")))
  }
}
