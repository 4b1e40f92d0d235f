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

  test("q265: reference grams broadcast onto candidate grams — no shuffle carries a ref row") {
    val p = plan("q265_bleu_eval")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "clipping must equi-join on (lang, n, gram)")
    assert(p.contains("BroadcastHashJoin"),
      "the 5-langs-of-≤32-gram reference table is the small side — it must broadcast")
  }

  test("q266: PMI totals broadcast; top-8 rides the bounded-heap top-k, no global sort") {
    val p = plan("q266_pmi_collocations")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "bigram↔unigram lookups must equi-join on (lang, word)")
    assert(p.contains("TopKLocal") || p.contains("WindowGroupLimit"),
      "the rank filter must plan as a bounded per-key heap, not filter-after-full-window")
  }

  test("q267: textrank rank state is checkpoint-backed; everything stays key-joined") {
    val p = plan("q267_textrank_keywords")
    assert(!p.contains("CartesianProduct"), s"pagerank must stay key-joined:\n$p")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      "per-round localCheckpoint must cut the iteration lineage")
  }

  test("q268: rank-sum is one scan folded to (lang, value) — no joins anywhere") {
    val t = tree("q268_rank_sum_test")
    assert(!t.exists(_.contains("Join")), "ranks come from the aggregated value frame")
    assert(t.count(_.contains("Scan parquet")) == 1)
    assert(t.count(_.contains("Window")) == 1, "one cumulative-rank window")
  }

  test("q269: truncation arms probe the LANDED full top-10, never re-derive it") {
    val p = plan("q269_matryoshka_recall")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Scan ExistingRDD"),
      "the full-dim top-10 must land once (lazy checkpoint) for all three consumers")
  }

  test("q270: truss rounds stay equi-joined; round state is checkpoint-backed") {
    val p = plan("q270_ktruss")
    assert(!p.contains("CartesianProduct"), s"wedge/closure joins must stay keyed:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("Scan ExistingRDD"),
      "per-round localCheckpoint must cut the peel lineage")
  }

  test("q271: BH frame is hypothesis-bounded — scalar crosses only, no shuffled join") {
    val p = plan("q271_fdr_bh")
    assert(!p.contains("CartesianProduct"),
      "m and k* are 1-row scalar broadcasts, never shuffle crosses")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q273: merged-count scoring keeps the q266 plan shape — keyed joins + bounded top-k") {
    val p = plan("q273_incremental_pmi")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("TopKLocal") || p.contains("WindowGroupLimit"),
      "top-8 must stay a bounded per-key heap after the merge")
  }

  test("q274: KS is one scan folded to (lang, value) — no joins, value-bounded windows") {
    val t = tree("q274_ks_test")
    assert(!t.exists(_.contains("Join")))
    assert(t.count(_.contains("Scan parquet")) == 1)
    assert(t.count(_.contains("Window")) <= 2,
      "cumulative + per-lang-total windows only")
  }

  test("q275: gini folds map-side to the catalog frame — no joins, one rank window") {
    val t = tree("q275_source_gini")
    assert(!t.exists(_.contains("Join")))
    assert(t.count(_.contains("Scan parquet")) == 1)
    assert(t.count(_.contains("Window")) == 1)
  }

  test("q276: temperature mix is map-only + one scalar cross — no shuffled join, no window") {
    val p = plan("q276_temperature_mix")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("Window"))
    assert(!p.contains("CartesianProduct"),
      "the sqrt-mass total must broadcast, never shuffle-cross")
  }

  test("q277: personalized rounds stay key-joined and checkpoint-backed") {
    val p = plan("q277_personalized_pagerank")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      "per-round localCheckpoint must cut the iteration lineage")
  }

  test("q278: basket pairs ride the basket-key equi-join; marginals broadcast") {
    val p = plan("q278_market_basket")
    assert(!p.contains("CartesianProduct"),
      "the basket total must broadcast, never shuffle-cross")
    assert(p.contains("BroadcastHashJoin"),
      "the |types|-row marginal frames must broadcast")
    assert(p.contains("Scan ExistingRDD"),
      "the distinct basket frame must land once for its three consumers")
  }

  test("q279: CUSUM folds map-side to the daily frame; totals are scalar crosses") {
    val t = tree("q279_cusum_changepoint")
    assert(t.exists(_.contains("Scan ExistingRDD")) &&
      t.count(_.contains("Scan parquet")) == 0,
      "the cumulative daily frame must land once — events never rescanned for totals")
    assert(!t.exists(_.contains("SortMergeJoin")))
    assert(!t.exists(_.contains("CartesianProduct")),
      "n and T must broadcast, never shuffle-cross")
  }

  test("q280: transitions come from per-user lead windows; the marginal broadcasts") {
    val p = plan("q280_markov_transitions")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      "the |types|-row from-marginal must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q281: the pair join runs over the LANDED calendar frame, never raw events") {
    val t = tree("q281_theilsen_trend")
    assert(t.count(_.contains("Scan parquet")) == 0 &&
      t.exists(_.contains("Scan ExistingRDD")),
      "the daily frame lands once; both pair sides and n_days probe it")
    assert(t.exists(_.contains("BroadcastNestedLoopJoin")),
      "the i<j non-equi pair join must plan as BNLJ over the landed daily frame")
    assert(!t.exists(_.contains("CartesianProduct")),
      "no CartesianProduct anywhere — scalar totals broadcast")
  }

  test("q282: the sweep reuses ONE landed shingle index for both postings sides") {
    val p = plan("q282_jaccard_threshold_sweep")
    assert(!p.contains("CartesianProduct"),
      "candidates come from shared-shingle postings, never a pair cross")
    assert(p.contains("Scan ExistingRDD"),
      "the shingle index must land once (q37's checkpoint discipline)")
  }

  test("q283: calibration inherits q38's checkpointed one-pass machinery") {
    val p = plan("q283_minhash_calibration")
    assert(!p.contains("CartesianProduct"),
      "candidates stay band-bounded; never a pair cross")
    assert(p.contains("Scan ExistingRDD"),
      "the shingle index and wide signatures must land once")
  }

  test("q272: decomposition folds map-side to the calendar frame; seasonal broadcasts") {
    val t = tree("q272_seasonal_decompose")
    assert(t.exists(_.contains("Scan ExistingRDD")),
      "the calendar frame must land once — events never rescanned for seasonal means")
    assert(t.count(_.contains("Scan parquet")) == 0)
    assert(t.exists(_.contains("BroadcastHashJoin")),
      "the 7-row seasonal frame must broadcast")
    assert(!t.exists(_.contains("SortMergeJoin")))
  }
}
