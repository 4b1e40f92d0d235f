package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.pipeline.{Export, MergeTrips, PublicData, ValidateLandings}

/** q95: the live DAG composed end-to-end at benchmark scale —
  * validate_landings (full 15-validator fold) → merge_trips
  * (unique-per-day full outer) → format_public_data (anonymized ids +
  * monthly recorded-activity rollup) → export (ontology renames +
  * period labels), over the same orders/lineitem-derived fixtures the
  * per-stage gates use. Each stage is oracle-gated on its own (q72,
  * q10, q74-q87); this entry gates the COMPOSITION itself — the oracle
  * chains the shared validate CTEs (ValidateQueries.oracle*Ctes)
  * through the unique-key full-outer merge, the anonymized-id monthly
  * rollup, and the export labels, so the stage handoffs (column
  * renames, null propagation through the merge, the md5 trip id) sit
  * under the hash gate too — and tracks the composition's cost
  * round-over-round in the bench (EndToEndSpec additionally pins the
  * semantics on hand-checked frames). */
object EndToEndQueries {

  val q95 = GQuery(
    "q95_end_to_end_dag",
    (s, d) => {
      // Materialize the validate stage ONCE at the stage boundary (lazy
      // localCheckpoint, submission-grain rows). Left lazy, the
      // downstream 5-column projection prunes one branch of the fold's
      // shared subtree narrower than its siblings, the exchanges stop
      // being identical, ReuseExchange/ReusedQueryStage dedup nothing,
      // and the whole 15-validator fold re-executes per consumer branch
      // (profiled: two extra 64-task stages, ~510 s task CPU, q95 26 s
      // → 14 s with the boundary). The reference DAG itself
      // materializes this handoff through its artifact store
      // (data-pipeline.yaml stage outputs), so the barrier is the
      // composition's semantics, not a local-bench hack.
      // Project the handoff down to the 4 columns merge_trips reads
      // BEFORE the checkpoint: the barrier then writes 4 narrow columns
      // per submission instead of the full 20-column validated frame
      // (the projection also prunes the fold's own plan — dimension
      // carries the merge never touches drop out of the final
      // validator projection entirely).
      // Since r10 the stage artifact is LANDED by q72 (the reference
      // DAG passes this handoff through its artifact store between
      // stages — data-pipeline.yaml stage outputs); probing it keeps
      // the barrier semantics AND drops the fold re-run when the
      // validate stage already ran this session. A standalone q95
      // still builds it (probeOrBuild), pinned so the multi-consumer
      // merge below never re-executes the fold per branch.
      val validated = ValidateQueries.validatedLanding(s, d, probe = true)
        .select(col("submission_id"), col("landing_date"),
          col("imei_resolved"), col("catch_price"))
      // per-submission catch weight (the reference's _weight artifact grain)
      val weights = ValidateQueries.fixtureCatch(s, d)
        .groupBy(col("submission_id"))
        .agg((graft.core.Exact.dsum(col("weight_g")) / 1000.0).as("weight_kg"))
      val forMerge = validated.join(weights, Seq("submission_id"), "left")
        .select(
          col("submission_id").as("landing_id"),
          col("landing_date"),
          col("imei_resolved").as("imei"),
          col("catch_price").as("total_catch_value"),
          col("weight_kg"))
      // GPS tracker fixture: every third order has a trip whose device
      // carries the full imei the landings' partials resolve to
      val pds = orders(s, d)
        .filter(col("o_orderkey") % 3 === 0)
        .select(
          (col("o_orderkey") + 10000000L).as("tracker_trip_id"),
          (to_timestamp(col("o_orderdate")) + expr("INTERVAL 16 HOURS")).as("ended"),
          concat(lit("77"), (lit(10000) + col("o_orderkey") % 200)).as("imei"))
      val merged = MergeTrips(forMerge, pds)
      val monthly = PublicData.summariseTrips(
        PublicData.withTripId(merged).filter(col("landing_date").isNotNull), "month")
      Export.aggregatedLabels(
        Export.renameOntology(monthly.withColumnRenamed("period_start", "date_bin_start")),
        "month", nBoats = Some(10L))
    },
    oracle = Some(s"""WITH ${ValidateQueries.oracleTripCtes},
      |${ValidateQueries.oracleCatchLadderCtes},
      |w8 AS (
      |  SELECT sid, CAST(SUM(CAST(weight_g AS DECIMAL(38,6))) AS DOUBLE) / 1000.0 AS weight_kg
      |  FROM catch GROUP BY sid),
      |landed AS (
      |  SELECT t.sid AS landing_id, t.landing_date,
      |    i.imei_resolved AS imei, p.catch_price AS total_catch_value, w.weight_kg
      |  FROM trip t
      |  LEFT JOIN imei_a i ON t.sid = i.sid
      |  LEFT JOIN pw_a p ON t.sid = p.sid
      |  LEFT JOIN w8 w ON t.sid = w.sid),
      |pds AS (
      |  SELECT o_orderkey + 10000000 AS tracker_trip_id,
      |    CAST(o_orderdate AS DATE) AS landing_date,
      |    '77' || CAST(10000 + o_orderkey % 200 AS VARCHAR) AS imei
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |lm AS (SELECT *, COUNT(*) OVER (PARTITION BY landing_date, imei) AS npk FROM landed),
      |rm AS (SELECT *, COUNT(*) OVER (PARTITION BY landing_date, imei) AS npk FROM pds),
      |merged AS (
      |  SELECT COALESCE(l.landing_date, r.landing_date) AS landing_date,
      |    l.landing_id, l.total_catch_value, l.weight_kg, r.tracker_trip_id
      |  FROM (SELECT * FROM lm WHERE npk = 1) l
      |  FULL JOIN (SELECT * FROM rm WHERE npk = 1) r
      |    ON l.landing_date = r.landing_date AND l.imei = r.imei
      |  UNION ALL
      |  SELECT landing_date, landing_id, total_catch_value, weight_kg, NULL
      |  FROM lm WHERE npk > 1
      |  UNION ALL
      |  SELECT landing_date, NULL, NULL, NULL, tracker_trip_id
      |  FROM rm WHERE npk > 1),
      |tid AS (
      |  SELECT *, md5(concat_ws(' ',
      |    COALESCE(CAST(landing_id AS VARCHAR), 'NA'),
      |    COALESCE(CAST(tracker_trip_id AS VARCHAR), 'NA'))) AS trip_id
      |  FROM merged WHERE landing_date IS NOT NULL),
      |binned AS (
      |  SELECT CAST(date_trunc('month', landing_date) AS DATE) AS date_bin_start, *
      |  FROM tid)
      |SELECT date_bin_start,
      |  COUNT(DISTINCT trip_id) AS n_trips,
      |  COUNT(landing_id) AS n_landings,
      |  COUNT(tracker_trip_id) AS n_tracks,
      |  CAST(SUM(CAST(weight_kg AS DECIMAL(38,6))) AS DOUBLE) AS catch_kg,
      |  CAST(SUM(CAST(total_catch_value AS DECIMAL(38,6))) AS DOUBLE) AS catch_value,
      |  strftime(date_bin_start, '%B %Y') AS month,
      |  strftime(date_bin_start, '%Y') AS year,
      |  CAST(10 AS BIGINT) AS n_boats
      |FROM binned GROUP BY date_bin_start""".stripMargin),
    headline = true)

  /** q209: the RLHF-data assembly DAG composed end-to-end — the
    * post-training counterpart of q95 (fisheries) and q202 (pretrain
    * mix): conversation logs sessionize into SFT pairs (the q196
    * assembly) → a stub reward model scores every example (md5-uniform
    * draw — the replayable seam a real RM plugs into, the multimodal
    * stub policy) → GRPO group-relative advantages per user
    * ([[graft.stats.Rewards.groupNormalize]], q207's operator) →
    * rejection sampling keeps the positive-advantage examples →
    * no-straddle first-fit packing (q94/q197's
    * [[graft.text.Packing.packFirstFit]]) → per-shard census with
    * advantage and id checksums pinning EXACT membership. Every stage
    * is gated alone (q196, q207, q197); this entry gates the
    * composition — scores flowing into group moments flowing into the
    * kept set flowing into bin boundaries — under one hash. */
  val q209 = GQuery(
    "q209_rlhf_data_dag",
    (s, d) => {
      import graft.text.TextFunctions.bpeishCount
      import org.apache.spark.sql.expressions.Window
      val e = events(s, d).select(col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_id"),
        concat(col("event_type"), lit(" "),
          floor(col("value") * 100).cast("long")).as("text"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val turns = e
        .withColumn("__chg",
          when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1)
            .when(lag(col("us"), 1).over(w).isNull, 1).otherwise(0))
        .withColumn("session", sum(col("__chg")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("user_id"), col("session"))
            .orderBy(col("us"), col("event_id"))))
        .withColumn("role",
          when(col("__rn") % 2 === 1, lit("user")).otherwise(lit("assistant")))
      val ex = graft.text.Sft.pairs(turns, Seq("user_id", "session"),
          Seq("us", "event_id"), "role", "text", targetRole = "assistant")
        .select(col("user_id"),
          (col("user_id") * 1000000L + col("session") * 1000L + col("turn_idx"))
            .as("ex_id"),
          (bpeishCount(col("prompt")) + bpeishCount(col("response"))).as("tt"))
      val scored = ex.withColumn("reward",
        conv(substring(md5(concat(lit("rm-"), col("ex_id").cast("string"))),
          1, 7), 16, 10).cast("long") / lit(268435456.0))
      val kept = graft.stats.Rewards
        .groupNormalize(scored, "user_id", "reward", "ex_id")
        .filter(col("advantage") > 0)
      val packed = graft.text.Packing.packFirstFit(
        kept.select(col("ex_id"), col("tt")), "ex_id", "tt",
        capacity = 256L, nShards = 2)
      packed.join(kept.select(col("ex_id"), col("advantage")), Seq("ex_id"))
        .groupBy(col("shard"))
        .agg(
          graft.core.Exact.lcount(lit(1)).as("n_examples"),
          countDistinct(col("bin")).as("n_bins"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(floor(col("advantage") * 1e6 + 0.5).cast("long")).as("adv_e6_sum"),
          sum(col("ex_id")).as("id_checksum"))
    },
    Some({
      val dsum = (x: String) => s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"
      s"""WITH RECURSIVE e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    event_type || ' ' || CAST(FLOOR(value * 100) AS BIGINT) AS text
      |  FROM events),
      |g AS (
      |  SELECT *, CASE WHEN us - lag(us) OVER w > 1800000000 THEN 1
      |                 WHEN lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |t AS (
      |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session
      |  FROM g),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, session
      |    ORDER BY us, event_id) AS rn
      |  FROM t),
      |turns AS (
      |  SELECT user_id, session, us, event_id, text, rn,
      |    CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END AS role
      |  FROM r),
      |hist AS (
      |  SELECT *, array_to_string(list(role || ': ' || text) OVER (
      |      PARTITION BY user_id, session ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), chr(10))
      |    AS prompt
      |  FROM turns),
      |ex AS (
      |  SELECT user_id, user_id * 1000000 + session * 1000 + rn AS ex_id,
      |    CAST(len(regexp_extract_all(prompt, '${graft.text.TextFunctions.BpeishPattern}'))
      |      + len(regexp_extract_all(text, '${graft.text.TextFunctions.BpeishPattern}'))
      |      AS BIGINT) AS tt
      |  FROM hist WHERE role = 'assistant'),
      |scored AS (
      |  SELECT *, CAST(('0x' || substr(md5('rm-' || CAST(ex_id AS VARCHAR)), 1, 7))
      |    AS BIGINT) / 268435456.0 AS reward
      |  FROM ex),
      |m AS (
      |  SELECT user_id, COUNT(*) AS n,
      |    ${dsum("reward")} AS s1, ${dsum("reward * reward")} AS s2
      |  FROM scored GROUP BY user_id),
      |mm AS (
      |  SELECT user_id, s1 / n AS mean,
      |    sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n),
      |                  CAST(0.0 AS DOUBLE))) AS sd
      |  FROM m),
      |kept AS (
      |  SELECT s.ex_id, s.tt,
      |    (s.reward - mm.mean) / mm.sd AS advantage
      |  FROM scored s JOIN mm ON s.user_id = mm.user_id
      |  WHERE mm.sd > 0 AND (s.reward - mm.mean) / mm.sd > 0),
      |docs AS (
      |  SELECT ex_id, tt, advantage,
      |    CAST(('0x' || substr(md5(CAST(ex_id AS VARCHAR)), 1, 7)) AS BIGINT) % 2 AS shard
      |  FROM kept),
      |ord AS (
      |  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY ex_id) AS rno
      |  FROM docs),
      |fit AS (
      |  SELECT shard, rno, ex_id, tt, advantage,
      |    CAST(0 AS BIGINT) AS bin, tt AS fill
      |  FROM ord WHERE rno = 1
      |  UNION ALL
      |  SELECT o.shard, o.rno, o.ex_id, o.tt, o.advantage,
      |    CASE WHEN f.fill > 0 AND f.fill + o.tt > 256 THEN f.bin + 1 ELSE f.bin END,
      |    CASE WHEN f.fill > 0 AND f.fill + o.tt > 256 THEN o.tt ELSE f.fill + o.tt END
      |  FROM fit f JOIN ord o ON o.shard = f.shard AND o.rno = f.rno + 1)
      |SELECT shard, COUNT(*) AS n_examples,
      |  CAST(COUNT(DISTINCT bin) AS BIGINT) AS n_bins,
      |  CAST(SUM(tt) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CAST(FLOOR(advantage * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS adv_e6_sum,
      |  CAST(SUM(ex_id) AS BIGINT) AS id_checksum
      |FROM fit GROUP BY shard""".stripMargin
    }))

  def queries: Seq[GQuery] = Seq(q95, q209)
}
