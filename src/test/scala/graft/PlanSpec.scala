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

  test("sampleByRate is a pure filter: no exchange, no aggregation in the plan") {
    import org.apache.spark.sql.functions.col
    val p = graft.operators.Sampling
      .sampleByRate(graft.core.Tables.documents(spark, sf),
        col("lang"), col("doc_id"), Map("en" -> 0.5))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), s"rate sampling must not shuffle:\n$p")
    assert(!p.contains("Aggregate"), s"rate sampling must not aggregate:\n$p")
  }

  test("q92: weight estimation broadcasts every dimension and never pair-joins") {
    val p = plan("q92_calculate_weights")
    assert(!p.contains("CartesianProduct"), s"pair join in weights plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), "lw/ll dims and combo estimates must broadcast")
    // the catch-side scan reads only the columns the estimate needs
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!reads.contains("l_comment") && !reads.contains("l_shipdate"),
      s"unused lineitem columns read:\n$reads")
  }

  test("q98: chunk materialization adds no shuffle beyond the pack window's") {
    val p = plan("q98_sequence_chunks")
    // one exchange for the per-shard window, one for the final census —
    // the segment explode itself must not repartition
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 3, s"unexpected exchanges ($exchanges):\n$p")
    assert(p.contains("Generate"), "segment explode missing")
  }

  test("assignSplit is a pure projection: no exchange, no aggregation") {
    import org.apache.spark.sql.functions.col
    val p = graft.operators.Splits
      .assignSplit(graft.core.Tables.documents(spark, sf), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), s"split assignment must not shuffle:\n$p")
    assert(!p.contains("Aggregate"), s"split assignment must not aggregate:\n$p")
  }

  test("q101: vocabulary top-k plans bounded heaps, never a global sort") {
    val p = plan("q101_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must be heap-based:\n$p")
    // the only Sort allowed is inside the k-row rank window, never over
    // the full vocabulary ahead of the limit
    assert(!p.linesIterator.exists(l => l.contains("Sort ") && l.contains("global=true")) ||
      p.indexOf("TakeOrderedAndProject") >= 0, s"global sort in vocab plan:\n$p")
  }

  test("q102: quantization broadcasts the per-dim stats; no pair join, no wide shuffle") {
    val p = plan("q102_int8_quant_error")
    assert(p.contains("BroadcastHashJoin"), "dim stats must broadcast back")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"quantization must not plan a wide join:\n$p")
  }

  test("q112: BM25 broadcasts the query terms; postings never cartesian") {
    val p = plan("q112_bm25_retrieval")
    assert(p.contains("BroadcastHashJoin"), "query terms must broadcast into postings")
    assert(!p.contains("CartesianProduct"), s"no all-pairs in retrieval:\n$p")
  }

  test("q116/q120/q121: selection, schedule and batching plan no global sort") {
    Seq("q116_token_budget", "q120_stride_schedule", "q121_length_batching")
      .foreach { q =>
        val p = plan(q)
        assert(!p.linesIterator.exists(l =>
          l.contains("Sort ") && l.contains("global=true")),
          s"$q must not global-sort:\n$p")
        assert(!p.contains("CartesianProduct"), s"$q: no cartesian:\n$p")
      }
  }

  test("q123: span localization broadcasts the benchmark vocabulary") {
    val p = plan("q123_contamination_spans")
    assert(p.contains("BroadcastHashJoin"), "bench fp vocabulary must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"corpus×benchmark must stay a semi join:\n$p")
  }

  test("q138: span self-dedup shuffles gram hashes, never gram strings or pairs") {
    val p = plan("q138_exact_span_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"self-dedup must stay postings-keyed:\n$p")
    // the occurrence window must partition on the two xxhash64
    // fingerprints — the gram string itself never crosses an exchange
    assert(p.contains("hashpartitioning(__h1"),
      s"expected a (__h1, __h2)-keyed exchange:\n$p")
    val gramShuffle = p.linesIterator
      .filter(_.contains("hashpartitioning"))
      .exists(_.contains("gram#"))
    assert(!gramShuffle, s"gram strings must not be a shuffle key:\n$p")
  }

  test("q141: composed curation DAG stays key-joined, span shuffle on fingerprints") {
    val p = plan("q141_llm_curation_dag")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"stage handoffs must stay id/fingerprint-keyed:\n$p")
    assert(p.contains("hashpartitioning(__h1"),
      s"span self-dedup inside the DAG must shuffle gram fingerprints:\n$p")
  }

  test("q125: snapshot diff is one id-keyed join, no cartesian, no window") {
    val p = plan("q125_snapshot_diff")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"diff must be an equi join:\n$p")
    assert(!p.contains("Window"), s"diff needs no window:\n$p")
  }

  test("q127/q133: novelty is shingle-keyed (window or anti-join), never a pair join") {
    for (q <- Seq("q127_novelty_scoring", "q133_incremental_novelty")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q leaked an all-pairs scan:\n$p")
    }
  }

  test("q128: weighted sample plans bounded per-partition top-n, not a global sort") {
    val p = plan("q128_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-n plan:\n$p")
  }

  test("q129: decontamination is a shingle-keyed semi/anti join pipeline") {
    val p = plan("q129_exact_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"collision probe must stay key-joined:\n$p")
    assert(p.contains("LeftAnti"), s"survivor anti-join missing:\n$p")
  }

  test("q134: feature hashing is a pure aggregation — the hash is the vocabulary, no join") {
    val p = plan("q134_feature_hashing")
    assert(!p.contains("Join"), s"a vocabulary join crept in:\n$p")
  }

  test("q136: rank fusion works over k-bounded lists — joins only under the bounded rankings") {
    val p = plan("q136_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), s"fusion must stay key-joined:\n$p")
  }

  test("q153: pagerank output joins stay node-keyed; no cartesian anywhere") {
    val p = plan("q153_pagerank_domains")
    assert(!p.contains("CartesianProduct"), s"pagerank must stay key-joined:\n$p")
    // the rank state is a checkpoint scan, not a re-derivation of the
    // whole iteration lineage (localCheckpoint per round)
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"rank state should be checkpoint-backed:\n$p")
  }

  test("q154: bloom probe broadcasts the 1-row filter; the only scan is the dim side") {
    val p = plan("q154_bloom_shingle_filter")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // the gram index is a shared checkpoint: documents is scanned only
    // for the broadcast source dim, not once per consumer subtree
    assert("FileScan".r.findAllIn(p).length <= 1,
      s"gram pass must be shared, not re-derived per consumer:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row bitset must broadcast:\n$p")
  }

  test("q156: streaming-bloom batch arm plans the state operator, keyed joins only") {
    val p = plan("q156_bloom_stream_parity")
    // batch mode plans the group-iteration operator as MapGroups (state
    // is trivially empty); a stream plans FlatMapGroupsWithState
    assert(p.contains("MapGroups") || p.contains("FlatMapGroupsWithState"),
      s"state operator missing:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q155: frame manifest is one pass + broadcast lang dim + one final shuffle") {
    val p = plan("q155_frame_sample_manifest")
    assert(p.contains("BroadcastHashJoin"), s"lang dim must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"manifest must not shuffle-join:\n$p")
  }

  test("q163: count-min sketch aggregates map-side; the 1-row sketch broadcasts") {
    val p = plan("q163_countmin_census")
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial pass before the exchange — the sketch merges, rows don't
    assert(p.contains("ObjectHashAggregate"), s"sketch must object-aggregate:\n$p")
    assert(p.contains("partial_count_min"), s"no map-side sketch partials:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row sketch must broadcast into the probe projection:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q164: hits iteration state is checkpoint-backed; joins stay node-keyed") {
    val p = plan("q164_hits_centrality")
    assert(!p.contains("CartesianProduct"), s"hits must stay key-joined:\n$p")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"score state should be checkpoint-backed (localCheckpoint per round):\n$p")
  }

  test("q165: water-fill touches the corpus once; the level row broadcasts") {
    val p = plan("q165_waterfill_budget")
    // the scan-side windows run over the bounded DOMAIN table; the
    // 1-row level frame joins back as a broadcast, never a shuffle join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"level row must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(!p.contains("SortMergeJoin"), s"domain-table joins must not shuffle:\n$p")
  }

  test("q168: DP release is one aggregation — map-side partials, no join") {
    val p = plan("q168_dp_release")
    assert(p.contains("partial_"), s"census must combine map-side:\n$p")
    assert(!p.contains("Join"), s"noise is a projection, not a join:\n$p")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"one census exchange expected, saw $exchanges:\n$p")
  }

  test("q169: bootstrap resamples combine map-side; no per-resample reshuffle") {
    val p = plan("q169_bootstrap_ci")
    // the rows×32 expansion must partial-aggregate before its exchange —
    // the shuffle carries |groups|×R partials, not the exploded rows
    assert(p.contains("partial_sum"), s"no map-side combine after explode:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // the point-estimate join keys on the group column (tiny frames);
    // the resample expansion itself must never join
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no loop join:\n$p")
  }

  test("q170: skew report broadcasts the 1-row total; per-key agg combines map-side") {
    val p = plan("q170_skew_report")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"per-key census must combine map-side:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the one-row totals must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join for a 1-row frame:\n$p")
  }

  test("q166: rendezvous sharding is join-free and explode-free — one agg exchange only") {
    val p = plan("q166_rendezvous_shards")
    assert(!p.contains("Join"), s"rendezvous must not join:\n$p")
    assert(!p.linesIterator.exists(_.trim.startsWith("Generate")),
      s"the shard fold must not explode rows:\n$p")
    // count detail headers "(n) Exchange" — the tree rendering repeats
    // each node once in the tree and once as a detail section
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"one census exchange expected, saw $exchanges:\n$p")
  }

  test("q173: the PCA moment pass is one aggregate, no row explosion, no join") {
    val p = plan("q173_pca_moment")
    assert(!p.contains("Join"), s"moment must not self-join the element table:\n$p")
    // the only Generate allowed is the 1-row triangle unpack AFTER the
    // aggregate — so at most one, and never under an Exchange input side
    val generates = p.linesIterator.count(_.trim.matches("\\(\\d+\\) Generate.*"))
    assert(generates <= 1, s"corpus-side explode crept back in:\n$p")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"moment should shuffle one buffer per partition:\n$p")
  }

  test("q186: PQ encoding is shuffle-free; ADC scan broadcasts the query LUTs") {
    val p = plan("q186_pq_adc")
    assert(p.contains("BroadcastExchange"), "query LUTs must broadcast")
    assert(!p.contains("CartesianProduct"),
      s"ADC must be a broadcast scan, not a cartesian:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the code scan must never shuffle-join the corpus:\n$p")
  }

  test("q181: the funnel reuses one user_id partitioning, never an event pair join") {
    val p = plan("q181_event_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"funnel must stay key-joined:\n$p")
  }

  test("q187: interval overlap is an equi-join on (key, bin), not a nested loop") {
    val p = plan("q187_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"overlap join degenerated:\n$p")
  }
}
