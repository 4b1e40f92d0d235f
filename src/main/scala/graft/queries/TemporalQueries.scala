package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.functions.Dates
import graft.operators.Chain
import graft.text.TextFunctions.{bpeishCount, BpeishPattern}

/** Temporal semantics from the reference's rollup/validation layer:
  * Sunday-start week binning with open-period proration (W5 + §2.8) and
  * consecutive-event chaining (W2 + A1).
  */
object TemporalQueries {

  /** A3/W5: weekly rollup on the Sunday-start week floor, with the
    * still-open final week prorated to a full-week equivalent
    * (`R/format-public-data.R:366-372,470-499`). */
  val q43 = GQuery(
    "q43_week_proration",
    (s, d) => {
      val o = orders(s, d)
      val weekly = o
        .groupBy(Dates.floorWeekSunday(col("o_orderdate")).as("week"))
        .agg(lcount(lit(1)).as("n"), lsum6(col("o_totalprice")).as("total"))
      val mx = o.agg(max(to_date(col("o_orderdate"))).as("maxd"))
      weekly.crossJoin(broadcast(mx))
        .withColumn("frac",
          least(greatest((datediff(col("maxd"), col("week")) + 1).cast("double") / 7.0,
            lit(0.0)), lit(1.0)))
        .select(col("week"), col("n"), col("total"),
          round(col("frac"), 6).as("frac"),
          round(col("total") / col("frac"), 6).as("prorated_total"))
    },
    Some(s"""WITH weekly AS (
      |  SELECT CAST(o_orderdate AS DATE) - CAST(dayofweek(o_orderdate) AS INT) AS week,
      |    COUNT(*) AS n, ${sqlLsum6("o_totalprice")} AS total
      |  FROM orders GROUP BY 1),
      |mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
      |f AS (
      |  SELECT w.week, w.n, w.total,
      |    LEAST(GREATEST(CAST(datediff('day', w.week, m.maxd) + 1 AS DOUBLE) / 7.0,
      |      0.0), 1.0) AS frac
      |  FROM weekly w CROSS JOIN mx m)
      |SELECT week, n, total, round(frac, 6) AS frac,
      |round(total / frac, 6) AS prorated_total
      |FROM f""".stripMargin))

  /** W2 + A1: pair-chaining of consecutive events (≤180 s apart) per
    * user, collapsed per chain head — the GPS consecutive-trip merge
    * (`R/validate-pds-trips.R:253-294`). Events are points (start=end). */
  val q44 = GQuery(
    "q44_consecutive_chain",
    (s, d) => {
      val ev = events(s, d).select(
        col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("t"))
      val chained = Chain.consecutive(ev, "user_id", "t", "t", "event_id",
        maxGapSeconds = 180L)
      Chain.collapse(chained, "user_id", "t", "t")
        .groupBy(col("user_id"))
        .agg(
          lcount(lit(1)).as("n_chains"),
          max(col("n_members")).as("max_members"),
          sum(when(col("n_members") > 1,
            unix_timestamp(col("chain_end")) - unix_timestamp(col("chain_start")))
            .otherwise(lit(0L))).as("chained_seconds"))
    },
    Some("""WITH ev AS (
      |  SELECT user_id, event_id, date_trunc('second', ts) AS t FROM events),
      |ch AS (
      |  SELECT user_id, event_id, t,
      |    lag(t) OVER w AS prev_t, lag(event_id) OVER w AS prev_id
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
      |assoc AS (
      |  SELECT user_id, event_id, t,
      |    CASE WHEN prev_t IS NOT NULL
      |           AND CAST(epoch(t) AS BIGINT) - CAST(epoch(prev_t) AS BIGINT) <= 180
      |         THEN prev_id ELSE event_id END AS associated_to
      |  FROM ch),
      |coll AS (
      |  SELECT user_id, associated_to,
      |    MIN(t) AS chain_start, MAX(t) AS chain_end, COUNT(*) AS n_members
      |  FROM assoc GROUP BY user_id, associated_to)
      |SELECT user_id, COUNT(*) AS n_chains, MAX(n_members) AS max_members,
      |CAST(SUM(CASE WHEN n_members > 1
      |  THEN CAST(epoch(chain_end) AS BIGINT) - CAST(epoch(chain_start) AS BIGINT)
      |  ELSE 0 END) AS BIGINT) AS chained_seconds
      |FROM coll GROUP BY user_id""".stripMargin))

  /** W-family: trailing time-RANGE window — each event's 1-hour trailing
    * exact sum per user, rolled up to the user's peak hour (the burst-
    * rate validation a tracker ingest needs). RANGE frames bound by the
    * event-time axis (unlike ROWS frames) so density spikes are measured
    * in wall-clock terms; both engines window on epoch microseconds to
    * avoid second-floor truncation mismatches. */
  val q56 = GQuery(
    "q56_trailing_range_window",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0L)
      events(s, d)
        .withColumn("trail", dsumOver(col("value"), w))
        .groupBy(col("user_id"))
        .agg(
          max(col("trail")).as("peak_hour_sum"),
          lcount(lit(1)).as("n_events"))
    },
    Some("""WITH t AS (
      |  SELECT user_id,
      |    CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
      |      PARTITION BY user_id ORDER BY epoch_us(ts)
      |      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail
      |  FROM events)
      |SELECT user_id, MAX(trail) AS peak_hour_sum, COUNT(*) AS n_events
      |FROM t GROUP BY user_id""".stripMargin))

  /** A3 at scale: the reference computes its day/week/month/year rollups
    * as four separate passes over the merged-trips table
    * (`R/format-public-data.R:363-457`, one `summarise_trips` call per
    * grain). GROUPING SETS folds all four grains into ONE scan and one
    * expand+aggregate — at 100 TB that is 1 shuffle instead of 4 full
    * reads. `grouping()` labels which set each output row came from. */
  val q70 = GQuery(
    "q70_grouping_sets",
    (s, d) => {
      val b = events(s, d).select(
        date_trunc("day", col("ts")).as("day"),
        date_trunc("week", col("ts")).as("week"),
        date_trunc("month", col("ts")).as("month"),
        date_trunc("year", col("ts")).as("year"),
        col("value"), col("user_id"))
      b.groupingSets(
          Seq(Seq(col("day")), Seq(col("week")), Seq(col("month")), Seq(col("year"))),
          col("day"), col("week"), col("month"), col("year"))
        .agg(
          when(grouping(col("day")) === 0, lit("day"))
            .when(grouping(col("week")) === 0, lit("week"))
            .when(grouping(col("month")) === 0, lit("month"))
            .otherwise(lit("year")).as("grain"),
          lcount(lit(1)).as("n"),
          lsum6(col("value")).as("total"),
          countDistinct(col("user_id")).as("n_users"))
        .select(
          col("grain"),
          coalesce(col("day"), col("week"), col("month"), col("year")).as("bucket"),
          col("n"), round(col("total"), 6).as("total"), col("n_users"))
    },
    Some(s"""WITH b AS (
      |  SELECT date_trunc('day', ts) AS day, date_trunc('week', ts) AS week,
      |    date_trunc('month', ts) AS month, date_trunc('year', ts) AS year,
      |    value, user_id
      |  FROM events)
      |SELECT CASE WHEN GROUPING(day) = 0 THEN 'day'
      |            WHEN GROUPING(week) = 0 THEN 'week'
      |            WHEN GROUPING(month) = 0 THEN 'month'
      |            ELSE 'year' END AS grain,
      |COALESCE(day, week, month, year) AS bucket,
      |COUNT(*) AS n, round(${sqlLsum6("value")}, 6) AS total,
      |CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM b GROUP BY GROUPING SETS ((day), (week), (month), (year))""".stripMargin))

  /** q181: ordered event funnel (view → click → purchase) — the
    * sequence-match kernel of product analytics, shaped for scale as
    * three user-keyed aggregations chained by co-partitioned joins
    * (the user_id shuffle is paid once and reused; never a self-join
    * over raw event pairs). Stage times are strict minima over ts
    * (t₂ = min click AFTER the first view, …), so the funnel is
    * deterministic without per-event tie-breaks, and the conversion
    * gaps sum exactly in int64 microseconds. */
  val q181 = GQuery(
    "q181_event_funnel",
    (s, d) => {
      val e = events(s, d).select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
        .localCheckpoint(eager = false) // read by all three stages
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("us") > col("t1"))
        .groupBy("user_id").agg(min(col("us")).as("t2"), min(col("t1")).as("t1"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("us") > col("t2"))
        .groupBy("user_id").agg(min(col("us")).as("t3"), min(col("t2")).as("t2b"))
      v.join(c.select(col("user_id"), col("t2"), (col("t2") - col("t1")).as("g12")),
          Seq("user_id"), "left")
        .join(p.select(col("user_id"), col("t3"), (col("t3") - col("t2b")).as("g23")),
          Seq("user_id"), "left")
        .agg(
          lcount(lit(1)).as("n_viewed"),
          lcount(col("t2")).as("n_clicked"),
          lcount(col("t3")).as("n_purchased"),
          sum(col("g12")).as("view_to_click_us"),
          sum(col("g23")).as("click_to_purchase_us"))
    },
    Some("""WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v AS (SELECT user_id, MIN(us) AS t1 FROM e
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(e.us) AS t2, MIN(v.t1) AS t1
      |      FROM e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.us > v.t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.us) AS t3, MIN(c.t2) AS t2b
      |      FROM e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.us > c.t2 GROUP BY e.user_id)
      |SELECT COUNT(*) AS n_viewed,
      |  COUNT(c.t2) AS n_clicked,
      |  COUNT(p.t3) AS n_purchased,
      |  CAST(SUM(c.t2 - c.t1) AS BIGINT) AS view_to_click_us,
      |  CAST(SUM(p.t3 - p.t2b) AS BIGINT) AS click_to_purchase_us
      |FROM v
      |LEFT JOIN c ON v.user_id = c.user_id
      |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin))

  /** q182: weekly retention cohorts — users grouped by first-seen week
    * (Monday trunc), per (cohort, week-offset) distinct active users
    * and exact activity mass. Two user-keyed aggregations + one
    * co-partitioned join; offsets are integer day arithmetic, never
    * float date math. */
  val q182 = GQuery(
    "q182_retention_cohorts",
    (s, d) => {
      val e = events(s, d).select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct() // user-week grain, mirroring the oracle's DISTINCT
        .localCheckpoint(eager = false)
      val first = e.groupBy("user_id").agg(min(col("wk")).as("cohort"))
      e.join(first, "user_id")
        .groupBy(col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"))
        .agg(
          countDistinct(col("user_id")).cast("long").as("n_active"),
          lcount(lit(1)).as("n_user_weeks"))
    },
    Some("""WITH e AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events),
      |f AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id)
      |SELECT f.cohort,
      |  CAST((e.wk - f.cohort) // 7 AS INT) AS week_offset,
      |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active,
      |  COUNT(*) AS n_user_weeks
      |FROM e JOIN f ON e.user_id = f.user_id
      |GROUP BY 1, 2""".stripMargin))

  /** q183: SCD-2 history build — the dimension-versioning kernel:
    * per user, consecutive runs of the tracked attribute (event_type)
    * collapse into validity intervals [valid_from, valid_to), the last
    * version open-ended. Two windows over ONE user-keyed sort (change
    * marking, then lead over change rows — the second window reuses
    * the first's partitioning), ties broken by event_id so versions
    * are deterministic. Per-user census: version count, closed span
    * mass (exact µs), longest closed version. */
  val q183 = GQuery(
    "q183_scd2_history",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val marked = events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("__prev", lag(col("event_type"), 1).over(w))
        .withColumn("__chg",
          col("__prev").isNull || col("__prev") =!= col("event_type"))
      val versions = marked.filter(col("__chg"))
        .withColumn("valid_to", lead(col("us"), 1).over(w))
      versions.groupBy(col("user_id"))
        .agg(
          lcount(lit(1)).as("n_versions"),
          sum(col("valid_to") - col("us")).as("closed_span_us"),
          max(col("valid_to") - col("us")).as("max_version_us"),
          min(col("us")).as("first_seen_us"))
    },
    Some("""WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |m AS (
      |  SELECT *, lag(event_type) OVER w AS prev
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |v AS (
      |  SELECT user_id, us,
      |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to
      |  FROM m WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, COUNT(*) AS n_versions,
      |  CAST(SUM(valid_to - us) AS BIGINT) AS closed_span_us,
      |  CAST(MAX(valid_to - us) AS BIGINT) AS max_version_us,
      |  CAST(MIN(us) AS BIGINT) AS first_seen_us
      |FROM v GROUP BY user_id""".stripMargin))

  /** q196: conversation-log → SFT pair assembly ([[graft.text.Sft]])
    * — the step that turns session transcripts into supervised
    * fine-tuning rows: events sessionize on a 30-minute gap, turns
    * alternate user/assistant by in-session position, and every
    * assistant turn becomes one (prompt = "role: text" history,
    * response) example via ONE running-concatenation window — no
    * self-join, no per-turn explosion. Prompt BYTES are under the
    * hash via an md5 prefix (the full prompt would bloat the gate
    * dump); the oracle rebuilds history with an ordered list window
    * over the identical (us, event_id) total order. */
  val q196 = GQuery(
    "q196_sft_pairs",
    (s, d) => {
      val e = events(s, d).select(col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_id"),
        concat(col("event_type"), lit(" "),
          floor(col("value") * 100).cast("long")).as("text"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val turns = e
        .withColumn("__chg",
          when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1)
            .when(lag(col("us"), 1).over(w).isNull, 1).otherwise(0))
        .withColumn("session", sum(col("__chg")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("session"))
            .orderBy(col("us"), col("event_id"))))
        .withColumn("role",
          when(col("__rn") % 2 === 1, lit("user")).otherwise(lit("assistant")))
      graft.text.Sft.pairs(turns, Seq("user_id", "session"),
          Seq("us", "event_id"), "role", "text", targetRole = "assistant")
        .select(col("user_id"), col("session"),
          col("turn_idx").cast("long").as("turn_idx"),
          col("n_history").cast("long").as("n_history"),
          length(col("prompt")).cast("long").as("prompt_chars"),
          substring(md5(col("prompt")), 1, 8).as("prompt_fp"),
          col("response"))
    },
    Some("""WITH e AS (
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
      |  FROM turns)
      |SELECT user_id, session, rn AS turn_idx, rn - 1 AS n_history,
      |  CAST(length(prompt) AS BIGINT) AS prompt_chars,
      |  substr(md5(prompt), 1, 8) AS prompt_fp,
      |  text AS response
      |FROM hist WHERE role = 'assistant'""".stripMargin))

  /** q197: loss-mask span manifest for packed SFT sequences — the
    * artifact an SFT run actually trains from: the q196 pairs get
    * BPE-ish token counts, pack no-straddle first-fit
    * ([[graft.text.Packing.packFirstFit]], capacity 256, 4 shards),
    * and each packed example emits its [offset, offset+len) spans —
    * prompt tokens MASKED from the loss, response tokens trained.
    * Empty spans (leading-assistant pairs have no prompt) drop out.
    * The oracle replays the conversation assembly, the token counts,
    * the per-shard first-fit recursion (the q94 pattern) and both
    * span emissions — every boundary byte-exact. */
  val q197 = GQuery(
    "q197_sft_pack_spans",
    (s, d) => {
      val e = events(s, d).select(col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_id"),
        concat(col("event_type"), lit(" "),
          floor(col("value") * 100).cast("long")).as("text"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val turns = e
        .withColumn("__chg",
          when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1)
            .when(lag(col("us"), 1).over(w).isNull, 1).otherwise(0))
        .withColumn("session", sum(col("__chg")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("session"))
            .orderBy(col("us"), col("event_id"))))
        .withColumn("role",
          when(col("__rn") % 2 === 1, lit("user")).otherwise(lit("assistant")))
      val ex = graft.text.Sft.pairs(turns, Seq("user_id", "session"),
          Seq("us", "event_id"), "role", "text", targetRole = "assistant")
        .select(
          (col("user_id") * 1000000L + col("session") * 1000L + col("turn_idx"))
            .as("ex_id"),
          bpeishCount(col("prompt")).as("pt"),
          bpeishCount(col("response")).as("rt"))
        .withColumn("tt", col("pt") + col("rt"))
      val packed = graft.text.Packing.packFirstFit(ex, "ex_id", "tt",
        capacity = 256L, nShards = 4)
      packed.join(ex.select(col("ex_id"), col("pt")), Seq("ex_id"))
        .select(col("shard"), col("bin"), col("ex_id"),
          explode(array(
            struct(col("offset").as("span_start"),
              (col("offset") + col("pt")).as("span_end"),
              lit(true).as("masked")),
            struct((col("offset") + col("pt")).as("span_start"),
              (col("offset") + col("n_tokens")).as("span_end"),
              lit(false).as("masked")))).as("sp"))
        .select(col("shard"), col("bin"), col("ex_id"),
          col("sp.span_start"), col("sp.span_end"), col("sp.masked"))
        .filter(col("span_start") < col("span_end"))
    },
    Some(s"""WITH RECURSIVE e AS (
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
      |  SELECT user_id * 1000000 + session * 1000 + rn AS ex_id,
      |    CAST(len(regexp_extract_all(prompt, '$BpeishPattern')) AS BIGINT) AS pt,
      |    CAST(len(regexp_extract_all(text, '$BpeishPattern')) AS BIGINT) AS rt
      |  FROM hist WHERE role = 'assistant'),
      |docs AS (
      |  SELECT ex_id, pt, pt + rt AS tt,
      |    CAST(('0x' || substr(md5(CAST(ex_id AS VARCHAR)), 1, 7)) AS BIGINT) % 4 AS shard
      |  FROM ex),
      |ord AS (
      |  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY ex_id) AS rno
      |  FROM docs),
      |fit AS (
      |  SELECT shard, rno, ex_id, pt, tt,
      |    CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS off, tt AS fill
      |  FROM ord WHERE rno = 1
      |  UNION ALL
      |  SELECT o.shard, o.rno, o.ex_id, o.pt, o.tt,
      |    CASE WHEN f.fill > 0 AND f.fill + o.tt > 256 THEN f.bin + 1 ELSE f.bin END,
      |    CASE WHEN f.fill > 0 AND f.fill + o.tt > 256 THEN CAST(0 AS BIGINT) ELSE f.fill END,
      |    CASE WHEN f.fill > 0 AND f.fill + o.tt > 256 THEN o.tt ELSE f.fill + o.tt END
      |  FROM fit f JOIN ord o ON o.shard = f.shard AND o.rno = f.rno + 1),
      |spans AS (
      |  SELECT shard, bin, ex_id, off AS span_start, off + pt AS span_end,
      |    TRUE AS masked FROM fit
      |  UNION ALL
      |  SELECT shard, bin, ex_id, off + pt, off + tt, FALSE FROM fit)
      |SELECT shard, bin, ex_id, span_start, span_end, masked
      |FROM spans WHERE span_start < span_end""".stripMargin))

  /** Exponentially time-decayed trending scores per event type
    * ([[graft.operators.Decay.halfLifeScores]], 7-day half-life) — the
    * recency-weighted activity ranker (crawl-frontier/feed shape)
    * beside q181's funnel and q182's cohorts. Weights are EXACT powers
    * of two on integer half-life steps (2^(50−k) longs, one int64
    * map-side-combined sum, one final division) — order-free and
    * engine-exact where IEEE pow(0.5, age/h) would be neither; the
    * >50-half-life zero cutoff is contract, replayed by the oracle. */
  val q263 = GQuery(
    "q263_decayed_trends",
    (s, d) =>
      graft.operators.Decay.halfLifeScores(
        events(s, d), col("ts"), Seq("event_type"), halfLifeDays = 7),
    Some("""WITH ref AS (SELECT MAX(CAST(ts AS DATE)) AS r FROM events),
      |w AS (
      |  SELECT event_type,
      |    CASE WHEN (ref.r - CAST(ts AS DATE)) // 7 <= 50
      |         THEN CAST(1 AS BIGINT) << CAST(50 - (ref.r - CAST(ts AS DATE)) // 7 AS INT)
      |         ELSE 0 END AS wgt
      |  FROM events, ref)
      |SELECT event_type, COUNT(*) AS n_events,
      |  round(CAST(SUM(CAST(wgt AS DECIMAL(38,0))) AS DOUBLE) / 1125899906842624.0, 6)
      |    AS decayed_score
      |FROM w GROUP BY event_type""".stripMargin))

  /** q272: classical seasonal decomposition of the daily event-value
    * series — total = trend + seasonal + remainder, with trend a
    * centered 7-row moving average (NULL where the window is partial),
    * seasonal the per-weekday mean of the detrended series, remainder
    * the leftovers. The ingest-volume diagnostic behind q191's drift
    * tests: "is Monday low because of drift, or because Mondays are
    * low?". Numerics: daily totals are decimal-routed ([[graft.core
    * .Exact.dsum]]); the MA re-sums the per-day DOUBLES as
    * DECIMAL(38,6) inside the window, so the 7-term sum is associative
    * and engine-exact; subtraction and the final /7 are exactly-rounded
    * IEEE ops. Scale shape: raw events fold map-side into the daily
    * frame (bounded by the calendar, not the event count); the single
    * ordered window and the 7-row seasonal join are calendar-bounded. */
  val q272 = GQuery(
    "q272_seasonal_decompose",
    (s, d) => {
      val daily = events(s, d)
        .select(to_date(col("ts")).as("day"), col("value"))
        .groupBy(col("day"))
        .agg(dsum(col("value")).as("total"), lcount(lit(1)).as("n_events"))
      val w7 = org.apache.spark.sql.expressions.Window
        .orderBy(col("day")).rowsBetween(-3, 3)
      val ma = daily
        .withColumn("trend",
          when(count(lit(1)).over(w7) === 7,
            sum(col("total").cast(Dec)).over(w7).cast("double") / 7))
        .withColumn("det", col("total") - col("trend"))
        .withColumn("dow", (dayofweek(col("day")) - 1).cast("int"))
        // two consumers (seasonal means + the final join): land the
        // calendar-bounded frame once instead of rescanning events
        .localCheckpoint(eager = false)
      val seas = ma.filter(col("det").isNotNull)
        .groupBy(col("dow")).agg(davg(col("det")).as("seasonal"))
      ma.join(broadcast(seas), Seq("dow"), "left")
        .select(col("day"), col("dow"), col("n_events"),
          round(col("total"), 6).as("total"),
          round(col("trend"), 6).as("trend"),
          round(col("seasonal"), 6).as("seasonal"),
          round(col("det") - col("seasonal"), 6).as("remainder"))
    },
    Some("""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY 1),
      |ma AS (
      |  SELECT day, n_events, total,
      |    CASE WHEN COUNT(*) OVER w7 = 7 THEN
      |      CAST(SUM(CAST(total AS DECIMAL(38,6))) OVER w7 AS DOUBLE) / 7
      |    END AS trend
      |  FROM daily
      |  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |dt AS (
      |  SELECT *, CAST(dayofweek(day) AS INT) AS dow, total - trend AS det
      |  FROM ma),
      |seas AS (
      |  SELECT dow,
      |    CAST(SUM(CAST(det AS DECIMAL(38,6))) AS DOUBLE) / COUNT(det) AS seasonal
      |  FROM dt WHERE det IS NOT NULL GROUP BY 1)
      |SELECT d.day, d.dow, CAST(d.n_events AS BIGINT) AS n_events,
      |  round(d.total, 6) AS total,
      |  round(d.trend, 6) AS trend,
      |  round(s.seasonal, 6) AS seasonal,
      |  round(d.det - s.seasonal, 6) AS remainder
      |FROM dt d LEFT JOIN seas s ON d.dow = s.dow""".stripMargin))

  /** q278: market-basket association rules (Agrawal 1993) over
    * (user, day) session baskets — which event types co-occur within
    * a user-day beyond what their marginals predict? All 20 ordered
    * type pairs scored exactly: confidence and lift as floor-scaled
    * integers (`(n_ab·10⁶) div n_a`, `(n_ab·N·10⁶) div (n_a·n_b)`
    * decimal-routed — int64 wraps once n_ab·N passes ~10¹² baskets²).
    * Scale shape: one distinct over (user, day, type), pairs via a
    * basket-key equi-join with item-domain-bounded fan-out (≤|types|²
    * output), marginals and the basket total broadcast. */
  val q278 = GQuery(
    "q278_market_basket",
    (s, d) => {
      val b = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
        .distinct()
        .localCheckpoint(eager = false) // three consumers of one distinct
      val nb = b.select(col("user_id"), col("day")).distinct()
        .agg(lcount(lit(1)).as("n_baskets"))
      val items = b.groupBy(col("event_type")).agg(lcount(lit(1)).as("n_item"))
      val nab = b
        .join(b.select(col("user_id"), col("day"),
          col("event_type").as("consequent")), Seq("user_id", "day"))
        .filter(col("event_type") =!= col("consequent"))
        .groupBy(col("event_type").as("antecedent"), col("consequent"))
        .agg(lcount(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 20)
      nab
        .join(broadcast(items.select(col("event_type").as("antecedent"),
          col("n_item").as("n_a"))), Seq("antecedent"))
        .join(broadcast(items.select(col("event_type").as("consequent"),
          col("n_item").as("n_b"))), Seq("consequent"))
        .crossJoin(nb) // 1-row scalar broadcast
        .select(col("antecedent"), col("consequent"), col("n_ab"),
          col("n_a"), col("n_b"), col("n_baskets"),
          expr("(n_ab * 1000000) div n_a").as("conf_e6"),
          expr("CAST((CAST(n_ab AS DECIMAL(38,0)) * n_baskets * 1000000) div " +
            "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("lift_e6"))
    },
    Some("""WITH b AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
      |  FROM events),
      |nb AS (
      |  SELECT COUNT(*) AS n_baskets FROM (
      |    SELECT DISTINCT user_id, day FROM b)),
      |items AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_item
      |  FROM b GROUP BY 1),
      |nab AS (
      |  SELECT a.event_type AS antecedent, c.event_type AS consequent,
      |    CAST(COUNT(*) AS BIGINT) AS n_ab
      |  FROM b a JOIN b c
      |    ON a.user_id = c.user_id AND a.day = c.day
      |    AND a.event_type <> c.event_type
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 20)
      |SELECT nab.antecedent, nab.consequent, nab.n_ab,
      |  ia.n_item AS n_a, ic.n_item AS n_b,
      |  CAST(nb.n_baskets AS BIGINT) AS n_baskets,
      |  CAST((nab.n_ab * 1000000) // ia.n_item AS BIGINT) AS conf_e6,
      |  CAST((CAST(nab.n_ab AS HUGEINT) * nb.n_baskets * 1000000)
      |    // (CAST(ia.n_item AS HUGEINT) * ic.n_item) AS BIGINT) AS lift_e6
      |FROM nab
      |JOIN items ia ON ia.event_type = nab.antecedent
      |JOIN items ic ON ic.event_type = nab.consequent, nb""".stripMargin))

  /** q279: CUSUM change-point detection over the daily event-value
    * series — WHERE did the level shift? (q272 asks whether a day is
    * seasonal; this asks when the regime changed; q191's PSI asks if
    * two windows drift). The classic offline CUSUM argmax
    * k* = argmax_i |Σ_{j≤i}(x_j − x̄)| is made DIVISION-FREE by
    * comparing n·S_i = n·cum_i − i·T instead (n = days, T = total) —
    * with daily totals as e6-floored int64 and the products
    * DECIMAL/HUGEINT-routed, the argmax and both segment means
    * (truncating div) are engine-exact end to end. Same scale shape
    * as q272: events fold map-side into the calendar-bounded daily
    * frame; one ordered window; scalar totals broadcast. */
  val q279 = GQuery(
    "q279_cusum_changepoint",
    (s, d) => {
      val daily = events(s, d)
        .select(to_date(col("ts")).as("day"), col("value"))
        .groupBy(col("day"))
        .agg(floor(dsum(col("value")) * 1e6 + lit(0.5)).cast("long").as("t_e6"))
      graft.operators.ChangePoint.cusum(daily, "day", "t_e6")
        .withColumnRenamed("mean_before", "mean_before_e6")
        .withColumnRenamed("mean_after", "mean_after_e6")
    },
    Some("""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
      |      * 1000000.0 + 0.5) AS BIGINT) AS t_e6
      |  FROM events GROUP BY 1),
      |cum AS (
      |  SELECT day, t_e6,
      |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
      |    CAST(SUM(t_e6) OVER (ORDER BY day) AS BIGINT) AS cum
      |  FROM daily),
      |tot AS (
      |  SELECT CAST(MAX(i) AS BIGINT) AS n, CAST(SUM(t_e6) AS BIGINT) AS t
      |  FROM cum),
      |scored AS (
      |  SELECT c.day, c.i, tot.n, c.cum, tot.t,
      |    abs(CAST(tot.n AS HUGEINT) * c.cum
      |      - CAST(c.i AS HUGEINT) * tot.t) AS score
      |  FROM cum c, tot),
      |top AS (
      |  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, day) AS rn
      |  FROM scored)
      |SELECT day, i, n, round(CAST(score AS DOUBLE), 6) AS score,
      |  CAST(cum // i AS BIGINT) AS mean_before_e6,
      |  CASE WHEN n > i THEN CAST((t - cum) // (n - i) AS BIGINT) END
      |    AS mean_after_e6
      |FROM top WHERE rn = 1""".stripMargin))

  /** q280: first-order Markov transition matrix over per-user event
    * sequences — P(next event type | current), the behavioral model
    * behind q181's funnel (which fixes ONE path; this estimates all
    * 25) and the generator for session-simulation tests. One lead
    * window per user ordered by (ts, event_id), transition counts,
    * and row-normalized probabilities as truncating-division ppm —
    * integer-exact. Scale shape: the window partitions by user (each
    * partition a user's own history), counts fold map-side, the
    * |types|-row marginal broadcasts. */
  val q280 = GQuery(
    "q280_markov_transitions",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tr = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(lcount(lit(1)).as("n"))
      val fromTot = tr.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
      tr.join(broadcast(fromTot), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
          expr("(n * 1000000) div n_from").as("p_e6"))
    },
    Some("""WITH tr AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |cnt AS (
      |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
      |  FROM cnt GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n, t.n_from,
      |  CAST((c.n * 1000000) // t.n_from AS BIGINT) AS p_e6
      |FROM cnt c JOIN tot t ON c.from_type = t.from_type""".stripMargin))

  /** q281: Theil–Sen robust trend of the daily event-value series —
    * the median of all pairwise slopes (Sen 1968), the outlier-proof
    * alternative to q25's OLS (one corrupted day can drag a
    * least-squares slope arbitrarily; it moves a median of C(n,2)
    * slopes by one rank). Numerics: slopes are single IEEE divisions
    * of e6-floored int64 differences (deterministic), the median is an
    * ORDER STATISTIC (odd count picks one slope; even averages two —
    * a commutative two-term sum), so the trend is engine-exact.
    * Scale shape: the pair join is over the CALENDAR-bounded daily
    * frame (n days → n²/2 pairs of a 365-row frame, not the event
    * count); the rank window and scalar crosses are pair-bounded. */
  val q281 = GQuery(
    "q281_theilsen_trend",
    (s, d) => {
      val daily = events(s, d)
        .select(to_date(col("ts")).as("day"), col("value"))
        .groupBy(col("day"))
        .agg(floor(dsum(col("value")) * 1e6 + lit(0.5)).cast("long").as("t_e6"))
      val idx = daily
        .withColumn("i", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("day"))).cast("long"))
        .localCheckpoint(eager = false) // both sides of the pair join
      val pairs = idx.select(col("i").as("ai"), col("t_e6").as("at"))
        .join(idx.select(col("i").as("bi"), col("t_e6").as("bt")),
          col("bi") > col("ai"))
        .select(col("ai"), col("bi"),
          ((col("bt") - col("at")).cast("double") /
            (col("bi") - col("ai")).cast("double")).as("slope"))
      val rk = pairs.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("slope"), col("ai"), col("bi"))).cast("long"))
      val tot = rk.agg(count(lit(1)).as("m"))
      val nd = idx.agg(count(lit(1)).as("n_days"))
      rk.crossJoin(tot) // pair-count scalar
        .filter(col("rn") === expr("(m + 1) div 2") ||
          col("rn") === expr("m div 2 + 1"))
        .crossJoin(nd)
        .groupBy(col("n_days"), col("m").as("n_pairs"))
        .agg((sum(col("slope")) / count(col("slope"))).as("__med"))
        .select(col("n_days"), col("n_pairs"),
          round(col("__med") / 1e6, 6).as("slope_per_day"))
    },
    Some("""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
      |      * 1000000.0 + 0.5) AS BIGINT) AS t_e6
      |  FROM events GROUP BY 1),
      |idx AS (
      |  SELECT day, t_e6,
      |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
      |  FROM daily),
      |pairs AS (
      |  SELECT a.i AS ai, b.i AS bi,
      |    CAST(b.t_e6 - a.t_e6 AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS slope
      |  FROM idx a JOIN idx b ON b.i > a.i),
      |rk AS (
      |  SELECT slope,
      |    CAST(ROW_NUMBER() OVER (ORDER BY slope, ai, bi) AS BIGINT) AS rn
      |  FROM pairs),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM rk),
      |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM idx),
      |sel AS (
      |  SELECT rk.slope FROM rk, tot
      |  WHERE rk.rn = (tot.m + 1) // 2 OR rk.rn = tot.m // 2 + 1)
      |SELECT nd.n_days, tot.m AS n_pairs,
      |  round((SUM(sel.slope) / COUNT(sel.slope)) / 1000000.0, 6)
      |    AS slope_per_day
      |FROM sel, tot, nd GROUP BY nd.n_days, tot.m""".stripMargin))

  /** q285: autocorrelation function (lags 1–7) + Ljung–Box Q over the
    * daily event-total series — the serial-dependence diagnostic beside
    * q272's decomposition and q291's trend test. ENTIRELY exact under
    * the hash until the final Q: centering is cross-multiplied
    * (c_t = n·x_t − T, so no mean division), autocovariances and the
    * ACF are DECIMAL(38,0) products with a truncating ÷
    * (acf_e6 = num·10⁶ div den), and the Ljung–Box partial sums ride a
    * COMMON-DENOMINATOR integer ladder: D = Π_{j=1..7}(n−j), term_j =
    * acf_e6_j²·(D div (n−j)), Σ over an ordered ROWS window (exact
    * decimal, associative) — only the last rescale to Q is IEEE,
    * rounded 6. Scale shape: raw events fold map-side to the calendar
    * frame; the lag self-join is 7·n calendar-bounded rows. */
  val q285 = GQuery(
    "q285_acf_ljung_box",
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val daily = events(s, d)
        .select(to_date(col("ts")).as("day"), col("value"))
        .groupBy(col("day"))
        .agg(floor(dsum(col("value")) + lit(0.5)).cast("long").as("x"))
      val idx = daily
        .withColumn("i", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("day"))).cast("long"))
        .localCheckpoint(eager = false) // scalars + both lag-join sides
      val tot = idx.agg(lcount(lit(1)).as("n"), sum(col("x")).as("t"))
      val c = idx.crossJoin(tot) // 1-row scalar broadcast
        .select(col("i"), col("n"), col("t"),
          (col("n") * col("x") - col("t")).cast(dec).as("c"))
        .localCheckpoint(eager = false) // den + 7 lag probes
      val den = c.agg(sum(col("c") * col("c")).as("den"),
        max(col("n")).as("n"))
      val num = c.select(col("i"), col("c"))
        .join(c.select(col("i").as("bi"), col("c").as("bc")),
          col("bi") > col("i") && col("bi") - col("i") <= 7)
        .groupBy((col("bi") - col("i")).as("lag"))
        .agg(sum(col("c") * col("bc")).as("num"))
      num.crossJoin(den) // 1-row scalar
        .withColumn("acf_e6", expr("(num * 1000000) div den"))
        .withColumn("__term", expr(
          """CAST(acf_e6 AS DECIMAL(38,0)) * acf_e6 *
            |((CAST(n - 1 AS DECIMAL(38,0)) * (n - 2) * (n - 3) * (n - 4)
            |  * (n - 5) * (n - 6) * (n - 7)) div (n - lag))""".stripMargin))
        .withColumn("__qnum", sum(col("__term")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("lag"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
        .select(col("lag"), col("n"), col("acf_e6"),
          expr("""round(CAST(n * (n + 2) AS DOUBLE) * CAST(__qnum AS DOUBLE)
            |  / (CAST(CAST(n - 1 AS DECIMAL(38,0)) * (n - 2) * (n - 3) * (n - 4)
            |      * (n - 5) * (n - 6) * (n - 7) AS DOUBLE) * 1e12), 6)
            |""".stripMargin).as("q_lb"))
    },
    Some("""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) + 0.5)
      |      AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |idx AS (
      |  SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
      |  FROM daily),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS t
      |  FROM idx),
      |c AS (SELECT i, n, t, CAST(n * x - t AS HUGEINT) AS c FROM idx, tot),
      |den AS (SELECT SUM(c * c) AS den, MAX(n) AS n FROM c),
      |num AS (
      |  SELECT b.i - a.i AS lag, SUM(a.c * b.c) AS num
      |  FROM c a JOIN c b ON b.i > a.i AND b.i - a.i <= 7
      |  GROUP BY 1),
      |acf AS (
      |  SELECT lag, den.n, (num.num * 1000000) // den.den AS acf_e6
      |  FROM num, den),
      |terms AS (
      |  SELECT lag, n, acf_e6,
      |    CAST(acf_e6 AS HUGEINT) * acf_e6 *
      |      ((CAST(n - 1 AS HUGEINT) * (n - 2) * (n - 3) * (n - 4)
      |        * (n - 5) * (n - 6) * (n - 7)) // (n - lag)) AS term
      |  FROM acf),
      |cum AS (
      |  SELECT lag, n, acf_e6,
      |    SUM(term) OVER (ORDER BY lag ROWS UNBOUNDED PRECEDING) AS qnum
      |  FROM terms)
      |SELECT lag, n, CAST(acf_e6 AS BIGINT) AS acf_e6,
      |  round(CAST(n * (n + 2) AS DOUBLE) * CAST(qnum AS DOUBLE)
      |    / (CAST(CAST(n - 1 AS HUGEINT) * (n - 2) * (n - 3) * (n - 4)
      |        * (n - 5) * (n - 6) * (n - 7) AS DOUBLE) * 1e12), 6) AS q_lb
      |FROM cum""".stripMargin))

  /** q301: Durbin–Watson serial-correlation statistic on the residuals
    * of the daily-total OLS trend — the "are the residuals independent"
    * check a pipeline runs AFTER q25-style least squares (DW ≈ 2 ⇒
    * uncorrelated; → 0 positive, → 4 negative serial correlation).
    * Numerics: the normal-equation sums (n, Σi, Σi², Σy, Σiy) are
    * DECIMAL(38,0)-exact, residuals are ONE fixed-order IEEE formula
    * per day (y − (na + nb·i)/D with exact decimal numerators — both
    * engines spell it identically), and the DW ratio routes the
    * squared residuals through the decimal dsum so neither sum
    * depends on partitioning. Scale shape: events fold map-side into
    * the calendar-bounded daily frame; one ordered lag window over
    * bounded days; scalar crosses. */
  val q301 = GQuery(
    "q301_durbin_watson",
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val W = org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .select(to_date(col("ts")).as("day"), col("value"))
        .groupBy(col("day"))
        .agg(floor(dsum(col("value")) * 1e6 + lit(0.5)).cast("long").as("y"))
        .withColumn("i", row_number().over(W.orderBy(col("day"))).cast("long"))
        .localCheckpoint(eager = false) // moment pass + residual pass
      val m = daily.agg(
        lcount(lit(1)).as("n"),
        sum(col("i").cast(dec)).as("st"),
        sum(col("i").cast(dec) * col("i")).as("stt"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("i").cast(dec) * col("y")).as("sty"))
      val e = daily.crossJoin(broadcast(m)) // 1-row scalar
        .withColumn("dd", expr("n * stt - st * st"))
        .withColumn("na", expr("sy * stt - st * sty"))
        .withColumn("nb", expr("n * sty - st * sy"))
        .withColumn("e", expr(
          "CAST(y AS DOUBLE) - CAST(na + nb * i AS DOUBLE) / CAST(dd AS DOUBLE)"))
        .withColumn("ep", lag(col("e"), 1).over(W.orderBy(col("day"))))
      e.groupBy(col("n"))
        .agg(
          dsum(col("e") * col("e")).as("__see"),
          dsum(when(col("ep").isNotNull,
            (col("e") - col("ep")) * (col("e") - col("ep")))).as("__sde"),
          max(expr("round(CAST(nb AS DOUBLE) / CAST(dd AS DOUBLE) / 1e6, 6)"))
            .as("slope_per_day"))
        .select(col("n").as("n_days"), col("slope_per_day"),
          expr("CASE WHEN __see > 0 THEN round(__sde / __see, 6) END").as("dw"))
    },
    Some("""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
      |      * 1000000.0 + 0.5) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |idx AS MATERIALIZED (
      |  SELECT day, y, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
      |  FROM daily),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(i AS HUGEINT)) AS st, SUM(CAST(i AS HUGEINT) * i) AS stt,
      |    SUM(CAST(y AS HUGEINT)) AS sy, SUM(CAST(i AS HUGEINT) * y) AS sty
      |  FROM idx),
      |e AS (
      |  SELECT idx.day, idx.i, m.n,
      |    m.n * m.stt - m.st * m.st AS dd,
      |    m.sy * m.stt - m.st * m.sty AS na,
      |    m.n * m.sty - m.st * m.sy AS nb,
      |    CAST(idx.y AS DOUBLE)
      |      - CAST(m.sy * m.stt - m.st * m.sty
      |          + (m.n * m.sty - m.st * m.sy) * idx.i AS DOUBLE)
      |        / CAST(m.n * m.stt - m.st * m.st AS DOUBLE) AS e
      |  FROM idx, m),
      |el AS (
      |  SELECT *, LAG(e) OVER (ORDER BY day) AS ep FROM e)
      |SELECT n AS n_days,
      |  MAX(round(CAST(nb AS DOUBLE) / CAST(dd AS DOUBLE) / 1e6, 6))
      |    AS slope_per_day,
      |  CASE WHEN CAST(SUM(CAST(e * e AS DECIMAL(38,6))) AS DOUBLE) > 0
      |  THEN round(
      |    CAST(SUM(CASE WHEN ep IS NOT NULL
      |      THEN CAST((e - ep) * (e - ep) AS DECIMAL(38,6)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(e * e AS DECIMAL(38,6))) AS DOUBLE), 6)
      |  END AS dw
      |FROM el GROUP BY n""".stripMargin))

  /** q302: lead–lag cross-correlation between the click and purchase
    * daily value series (lags 0–7 days) — WHICH lag moves together:
    * the attribution-window diagnostic beside q285's same-series ACF.
    * Per lag the overlap join runs on integer epoch-day keys
    * (bi = ai + lag), the Pearson moments (n, Σx, Σy, Σx², Σy², Σxy)
    * are DECIMAL(38,0)-exact per lag, and r is one fixed-order IEEE
    * formula over those exact inputs, rounded 6 (NULL when either
    * variance term vanishes). Scale shape: events fold map-side into
    * two calendar-bounded daily frames; the lag spine (8 rows) and
    * both dailies are broadcast-scale; pairs ≤ 8·n_days. */
  val q302 = GQuery(
    "q302_cross_correlation",
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      def daily(t: String) = events(s, d)
        .filter(col("event_type") === t)
        .groupBy(datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
          .cast("long").as("di"))
        .agg(floor(dsum(col("value")) * 1e6 + lit(0.5)).cast("long").as("v"))
      val lags = s.range(0, 8).select(col("id").as("lag"))
      val pairs = daily("click").select(col("di").as("ai"), col("v").as("x"))
        .crossJoin(broadcast(lags)) // 8-row spine
        .join(daily("purchase").select(col("di").as("bi"), col("v").as("y")),
          col("bi") === col("ai") + col("lag"))
      pairs.groupBy(col("lag"))
        .agg(
          lcount(lit(1)).as("n_days"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum(col("x").cast(dec) * col("x")).as("sxx"),
          sum(col("y").cast(dec) * col("y")).as("syy"),
          sum(col("x").cast(dec) * col("y")).as("sxy"))
        .select(col("lag"), col("n_days"),
          expr("""CASE WHEN (n_days * sxx - sx * sx) > 0
            |  AND (n_days * syy - sy * sy) > 0
            |THEN round(
            |  CAST(n_days * sxy - sx * sy AS DOUBLE)
            |  / sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
            |         * CAST(n_days * syy - sy * sy AS DOUBLE)), 6)
            |END""".stripMargin).as("r"))
        .orderBy(col("lag"))
    },
    Some("""WITH cd AS (
      |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ai,
      |    CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
      |      * 1000000.0 + 0.5) AS BIGINT) AS x
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |pd AS (
      |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS bi,
      |    CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
      |      * 1000000.0 + 0.5) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |lags AS (SELECT unnest(generate_series(0, 7)) AS lag),
      |pairs AS (
      |  SELECT CAST(lags.lag AS BIGINT) AS lag, cd.x, pd.y
      |  FROM cd CROSS JOIN lags JOIN pd ON pd.bi = cd.ai + lags.lag),
      |m AS (
      |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |    SUM(CAST(y AS HUGEINT) * y) AS syy,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM pairs GROUP BY lag)
      |SELECT lag, n_days,
      |  CASE WHEN (n_days * sxx - sx * sx) > 0
      |    AND (n_days * syy - sy * sy) > 0
      |  THEN round(
      |    CAST(n_days * sxy - sx * sy AS DOUBLE)
      |    / sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
      |           * CAST(n_days * syy - sy * sy AS DOUBLE)), 6)
      |  END AS r
      |FROM m ORDER BY lag""".stripMargin))

  /** q303: EWMA control chart (α = 1/2, L = 3) over the daily
    * event-value totals — the small-shift detector beside q279's CUSUM
    * (CUSUM localizes ONE level shift after the fact; the EWMA chart
    * flags every day the smoothed level exits its widening ±3σ band).
    * The smoother is the 40-lag TRUNCATED EWMA (weights 2^(39−k),
    * k = t−j ≤ 39 — mass beyond lag 39 is < 2⁻⁴⁰, far below the e6
    * grain; the q263 truncation precedent), so the level is an EXACT
    * integer: numerator/denominator ride the calendar-bounded pair
    * join with shiftleft weights (DECIMAL-routed ×y), ewma_e6 is one
    * truncating ÷ of positives. Control limits use the classic
    * variance inflation (1 − 4⁻ᵗ)/3 with the 4⁻ᵗ term dropped past
    * t = 26 where it is below one double ULP (engine-exact either
    * way); center/sd come from exact decimal moments, the band is one
    * fixed-order IEEE formula rounded 6, and the flag compares the
    * exact integer level against the band. */
  val q303 = GQuery(
    "q303_ewma_control_chart",
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val W = org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .select(to_date(col("ts")).as("day"), col("value"))
        .groupBy(col("day"))
        .agg(floor(dsum(col("value")) * 1e6 + lit(0.5)).cast("long").as("y"))
        .withColumn("i", row_number().over(W.orderBy(col("day"))).cast("long"))
        .localCheckpoint(eager = false) // pair join sides + the moment pass
      val m = daily.agg(
        lcount(lit(1)).as("n"),
        sum(col("y").cast(dec)).as("t"),
        sum(col("y").cast(dec) * col("y")).as("q"))
      val ew = daily.select(col("i").as("ti"), col("day"), col("y"))
        .join(daily.select(col("i").as("ji"), col("y").as("yj")),
          col("ji") <= col("ti") && col("ji") > col("ti") - 40)
        .groupBy(col("ti"), col("day"), col("y"))
        .agg(
          sum(expr("CAST(shiftleft(1L, CAST(39 - (ti - ji) AS INT)) AS DECIMAL(38,0))")
            * col("yj")).as("num"),
          sum(expr("shiftleft(1L, CAST(39 - (ti - ji) AS INT))")).as("den"))
        .select(col("ti").as("i"), col("day"), col("y"),
          expr("CAST(num div den AS BIGINT)").as("ewma_e6"))
      ew.crossJoin(broadcast(m)) // 1-row scalar
        .withColumn("sd", expr(
          """CASE WHEN n > 1 AND (n * q - t * t) > 0 THEN
            |  sqrt(CAST(n * q - t * t AS DOUBLE)
            |    / CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE)) ELSE 0.0
            |END""".stripMargin))
        .withColumn("infl", expr(
          """CASE WHEN i <= 26
            |  THEN sqrt((1.0 - 1.0
            |    / CAST(shiftleft(1L, CAST(2 * least(i, 26) AS INT)) AS DOUBLE))
            |    / 3.0)
            |  ELSE sqrt(CAST(1.0 AS DOUBLE) / 3.0)
            |END""".stripMargin))
        .select(col("day"), col("i"), col("y"), col("ewma_e6"),
          expr("""round((CAST(t AS DOUBLE) / CAST(n AS DOUBLE)
            |  + 3.0 * sd * infl) / 1e6, 6)""".stripMargin).as("ucl"),
          expr("""round((CAST(t AS DOUBLE) / CAST(n AS DOUBLE)
            |  - 3.0 * sd * infl) / 1e6, 6)""".stripMargin).as("lcl"),
          expr("""CAST(ewma_e6 AS DOUBLE) >
            |  CAST(t AS DOUBLE) / CAST(n AS DOUBLE) + 3.0 * sd * infl
            |OR CAST(ewma_e6 AS DOUBLE) <
            |  CAST(t AS DOUBLE) / CAST(n AS DOUBLE) - 3.0 * sd * infl"""
            .stripMargin).as("out_of_control"))
        .orderBy(col("day"))
    },
    Some("""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
      |      * 1000000.0 + 0.5) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |idx AS MATERIALIZED (
      |  SELECT day, y, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
      |  FROM daily),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(CAST(y AS HUGEINT)) AS t,
      |    SUM(CAST(y AS HUGEINT) * y) AS q
      |  FROM idx),
      |ew AS (
      |  SELECT a.i, a.day, a.y,
      |    CAST(SUM(CAST(CAST(1 AS BIGINT) << CAST(39 - (a.i - b.i) AS INT)
      |        AS HUGEINT) * b.y)
      |      // SUM(CAST(1 AS BIGINT) << CAST(39 - (a.i - b.i) AS INT))
      |      AS BIGINT) AS ewma_e6
      |  FROM idx a JOIN idx b ON b.i <= a.i AND b.i > a.i - 40
      |  GROUP BY a.i, a.day, a.y),
      |lim AS (
      |  SELECT ew.*, m.n, m.t,
      |    CASE WHEN m.n > 1 AND (m.n * m.q - m.t * m.t) > 0 THEN
      |      sqrt(CAST(m.n * m.q - m.t * m.t AS DOUBLE)
      |        / CAST(m.n AS DOUBLE) / CAST(m.n - 1 AS DOUBLE)) ELSE 0.0
      |    END AS sd,
      |    CASE WHEN ew.i <= 26
      |      THEN sqrt((1.0 - 1.0
      |        / CAST(CAST(1 AS BIGINT) << CAST(2 * LEAST(ew.i, 26) AS INT)
      |          AS DOUBLE))
      |        / 3.0)
      |      ELSE sqrt(CAST(1.0 AS DOUBLE) / 3.0) END AS infl
      |  FROM ew, m)
      |SELECT day, i, y, ewma_e6,
      |  round((CAST(t AS DOUBLE) / CAST(n AS DOUBLE)
      |    + 3.0 * sd * infl) / 1e6, 6) AS ucl,
      |  round((CAST(t AS DOUBLE) / CAST(n AS DOUBLE)
      |    - 3.0 * sd * infl) / 1e6, 6) AS lcl,
      |  CAST(ewma_e6 AS DOUBLE) >
      |    CAST(t AS DOUBLE) / CAST(n AS DOUBLE) + 3.0 * sd * infl
      |  OR CAST(ewma_e6 AS DOUBLE) <
      |    CAST(t AS DOUBLE) / CAST(n AS DOUBLE) - 3.0 * sd * infl
      |    AS out_of_control
      |FROM lim ORDER BY day""".stripMargin))

  /** q309: Kendall's τ-b between the click and purchase daily value
    * series — the rank-concordance companion to q302's Pearson
    * lead-lag (Pearson asks "linear at which lag"; τ-b asks "do they
    * even move together", immune to any monotone rescaling).
    * Concordant/discordant/tie counts come off the calendar-bounded
    * day-pair join (q281's shape: n²/2 pairs of a bounded frame, not
    * the event count) as exact integers via sign products, and
    * τ-b = (nc − nd)/√((n₀−n₁)(n₀−n₂)) is one fixed-order IEEE
    * formula over exact inputs, rounded 6. */
  val q309 = GQuery(
    "q309_kendall_tau_b",
    (s, d) => {
      def daily(t: String) = events(s, d)
        .filter(col("event_type") === t)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(floor(dsum(col("value")) * 1e6 + lit(0.5)).cast("long"))
      val joined = daily("click").toDF("day", "x")
        .join(daily("purchase").toDF("day", "y"), Seq("day"))
        .localCheckpoint(eager = false) // both sides of the pair join
      val pairs = joined.toDF("ad", "ax", "ay")
        .join(joined.toDF("bd", "bx", "by"), col("bd") > col("ad"))
        .select(
          signum(col("bx") - col("ax")).cast("long").as("sx"),
          signum(col("by") - col("ay")).cast("long").as("sy"))
      val n = joined.agg(lcount(lit(1)).as("n_days"))
      pairs.agg(
          lcount(lit(1)).as("n_pairs"),
          coalesce(sum(when(col("sx") * col("sy") > 0, 1L)), lit(0L)).as("nc"),
          coalesce(sum(when(col("sx") * col("sy") < 0, 1L)), lit(0L)).as("nd"),
          coalesce(sum(when(col("sx") === 0, 1L)), lit(0L)).as("n1"),
          coalesce(sum(when(col("sy") === 0, 1L)), lit(0L)).as("n2"))
        .crossJoin(broadcast(n)) // 1-row scalar
        .select(col("n_days"), col("n_pairs"), col("nc"), col("nd"),
          expr("""CASE WHEN (n_pairs - n1) > 0 AND (n_pairs - n2) > 0
            |THEN round(
            |  CAST(nc - nd AS DOUBLE)
            |  / sqrt(CAST(n_pairs - n1 AS DOUBLE)
            |         * CAST(n_pairs - n2 AS DOUBLE)), 6)
            |END""".stripMargin).as("tau_b"))
    },
    Some("""WITH cd AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
      |      * 1000000.0 + 0.5) AS BIGINT) AS x
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |pd AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
      |      * 1000000.0 + 0.5) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |joined AS MATERIALIZED (
      |  SELECT cd.day, cd.x, pd.y FROM cd JOIN pd ON cd.day = pd.day),
      |pairs AS (
      |  SELECT CAST(sign(b.x - a.x) AS BIGINT) AS sx,
      |    CAST(sign(b.y - a.y) AS BIGINT) AS sy
      |  FROM joined a JOIN joined b ON b.day > a.day),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    COALESCE(CAST(SUM(CASE WHEN sx * sy > 0 THEN 1 END) AS BIGINT), 0)
      |      AS nc,
      |    COALESCE(CAST(SUM(CASE WHEN sx * sy < 0 THEN 1 END) AS BIGINT), 0)
      |      AS nd,
      |    COALESCE(CAST(SUM(CASE WHEN sx = 0 THEN 1 END) AS BIGINT), 0) AS n1,
      |    COALESCE(CAST(SUM(CASE WHEN sy = 0 THEN 1 END) AS BIGINT), 0) AS n2
      |  FROM pairs),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM joined)
      |SELECT n.n_days, agg.n_pairs, agg.nc, agg.nd,
      |  CASE WHEN (n_pairs - n1) > 0 AND (n_pairs - n2) > 0
      |  THEN round(
      |    CAST(nc - nd AS DOUBLE)
      |    / sqrt(CAST(n_pairs - n1 AS DOUBLE)
      |           * CAST(n_pairs - n2 AS DOUBLE)), 6)
      |  END AS tau_b
      |FROM agg, n""".stripMargin))

  /** q310: Wald–Wolfowitz runs test for randomness of the daily
    * event-value series around its median — the "is the sequence
    * order itself suspicious" check beside q285's ACF (ACF measures
    * HOW values co-move; the runs test only counts sign alternations,
    * so level changes, striping from a backfill job, or alternating
    * shards all trip it). The lower median reads off the value ladder
    * (q297's order-statistic pattern, no IEEE interpolation), equal
    * days drop per the classic treatment, runs count via one ordered
    * lag window, and z = (R − μ)/σ is one fixed-order IEEE formula
    * over exact integer moments, rounded 6. */
  val q310 = GQuery(
    "q310_runs_test",
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val W = org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .select(to_date(col("ts")).as("day"), col("value"))
        .groupBy(col("day"))
        .agg(floor(dsum(col("value")) * 1e6 + lit(0.5)).cast("long").as("y"))
        .localCheckpoint(eager = false) // ladder + the sign pass
      val ladder = daily.groupBy(col("y").as("v"))
        .agg(lcount(lit(1)).as("cnt"))
        .withColumn("hi", sum(col("cnt")).over(W.orderBy(col("v"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .withColumn("lo", col("hi") - col("cnt") + 1)
      val nd = daily.agg(lcount(lit(1)).as("n_all"))
        .withColumn("mr", expr("(n_all + 1) div 2"))
      val med = ladder.crossJoin(broadcast(nd)) // 1-row scalar
        .filter(col("hi") >= col("mr") && col("lo") <= col("mr"))
        .agg(max(col("v")).as("med"))
      val signs = daily.crossJoin(broadcast(med)) // 1-row scalar
        .filter(col("y") =!= col("med"))
        .select(col("day"), (col("y") > col("med")).as("s"))
        .withColumn("sp", lag(col("s"), 1).over(W.orderBy(col("day"))))
      signs.agg(
          coalesce(sum(when(col("s"), 1L)), lit(0L)).as("n_above"),
          coalesce(sum(when(!col("s"), 1L)), lit(0L)).as("n_below"),
          coalesce(sum(when(col("sp").isNull ||
            (col("s") =!= col("sp")), 1L)), lit(0L)).as("n_runs"))
        .select(col("n_above"), col("n_below"), col("n_runs"),
          expr("""CASE WHEN n_above > 0 AND n_below > 0
            |  AND n_above + n_below > 1
            |  AND (2 * CAST(n_above AS DECIMAL(38,0)) * n_below
            |    * (2 * CAST(n_above AS DECIMAL(38,0)) * n_below
            |       - n_above - n_below)) > 0
            |THEN round(
            |  (CAST(n_runs AS DOUBLE)
            |   - (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
            |      / CAST(n_above + n_below AS DOUBLE) + 1.0))
            |  / sqrt(
            |    CAST(2 * CAST(n_above AS DECIMAL(38,0)) * n_below
            |      * (2 * CAST(n_above AS DECIMAL(38,0)) * n_below
            |         - n_above - n_below) AS DOUBLE)
            |    / CAST(CAST(n_above + n_below AS DECIMAL(38,0))
            |        * (n_above + n_below) * (n_above + n_below - 1)
            |        AS DOUBLE)), 6)
            |END""".stripMargin).as("z"))
    },
    Some("""WITH daily AS MATERIALIZED (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
      |      * 1000000.0 + 0.5) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |ladder AS (
      |  SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
      |    SUM(COUNT(*)) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) AS hi,
      |    SUM(COUNT(*)) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
      |      - COUNT(*) + 1 AS lo
      |  FROM daily GROUP BY y),
      |nd AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
      |    (CAST(COUNT(*) AS BIGINT) + 1) // 2 AS mr
      |  FROM daily),
      |med AS (
      |  SELECT MAX(l.v) AS med FROM ladder l, nd
      |  WHERE l.hi >= nd.mr AND l.lo <= nd.mr),
      |signs AS (
      |  SELECT day, y > med.med AS s FROM daily, med WHERE y <> med.med),
      |lagged AS (
      |  SELECT s, LAG(s) OVER (ORDER BY day) AS sp FROM signs),
      |agg AS (
      |  SELECT
      |    COALESCE(CAST(SUM(CASE WHEN s THEN 1 END) AS BIGINT), 0) AS n_above,
      |    COALESCE(CAST(SUM(CASE WHEN NOT s THEN 1 END) AS BIGINT), 0)
      |      AS n_below,
      |    COALESCE(CAST(SUM(CASE WHEN sp IS NULL OR s <> sp THEN 1 END)
      |      AS BIGINT), 0) AS n_runs
      |  FROM lagged)
      |SELECT n_above, n_below, n_runs,
      |  CASE WHEN n_above > 0 AND n_below > 0
      |    AND n_above + n_below > 1
      |    AND (2 * CAST(n_above AS HUGEINT) * n_below
      |      * (2 * CAST(n_above AS HUGEINT) * n_below
      |         - n_above - n_below)) > 0
      |  THEN round(
      |    (CAST(n_runs AS DOUBLE)
      |     - (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
      |        / CAST(n_above + n_below AS DOUBLE) + 1.0))
      |    / sqrt(
      |      CAST(2 * CAST(n_above AS HUGEINT) * n_below
      |        * (2 * CAST(n_above AS HUGEINT) * n_below
      |           - n_above - n_below) AS DOUBLE)
      |      / CAST(CAST(n_above + n_below AS HUGEINT)
      |          * (n_above + n_below) * (n_above + n_below - 1)
      |          AS DOUBLE)), 6)
      |  END AS z
      |FROM agg""".stripMargin))

  /** q317: cohort retention matrix — the product-analytics staple
    * beside q181's funnel (the funnel tracks ONE path; retention asks
    * "of the users first seen on day D, what fraction was still
    * active k weeks later"): cohort = each user's first active day,
    * week offset = (active_day − cohort_day) div 7, cells count
    * DISTINCT returning users. Everything is integer (cohort sizes,
    * active counts, retention as truncating-÷ ppm). Scale shape: the
    * first-seen pass and the (user, day) dedup are the only fact-sized
    * work, both one shuffle on user_id; the (cohort_day × offset)
    * matrix is calendar²-bounded, and the cohort-size frame
    * broadcasts onto it. */
  val q317 = GQuery(
    "q317_cohort_retention",
    (s, d) => {
      val active = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .localCheckpoint(eager = false) // first-seen pass + cell probe
      val cohorts = active.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      val sizes = cohorts.groupBy(col("cohort_day"))
        .agg(lcount(lit(1)).as("n_cohort"))
      val cells = active.join(cohorts, Seq("user_id"))
        .select(col("cohort_day"),
          (datediff(col("day"), col("cohort_day")).cast("long") / 7)
            .cast("long").as("offset_w"),
          col("user_id"))
        .distinct()
        .groupBy(col("cohort_day"), col("offset_w"))
        .agg(lcount(lit(1)).as("n_active"))
      cells.join(broadcast(sizes), Seq("cohort_day"))
        .select(col("cohort_day"), col("offset_w"), col("n_active"),
          col("n_cohort"),
          expr("(n_active * 1000000) div n_cohort").as("retention_ppm"))
        .orderBy(col("cohort_day"), col("offset_w"))
    },
    Some("""WITH active AS MATERIALIZED (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |cohorts AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM active GROUP BY user_id),
      |sizes AS (
      |  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_cohort
      |  FROM cohorts GROUP BY cohort_day),
      |cells AS (
      |  SELECT cohort_day, offset_w, CAST(COUNT(*) AS BIGINT) AS n_active
      |  FROM (
      |    SELECT DISTINCT c.cohort_day,
      |      CAST(a.day - c.cohort_day AS BIGINT) // 7 AS offset_w,
      |      a.user_id
      |    FROM active a JOIN cohorts c ON a.user_id = c.user_id)
      |  GROUP BY cohort_day, offset_w)
      |SELECT ce.cohort_day, ce.offset_w, ce.n_active, s.n_cohort,
      |  (ce.n_active * 1000000) // s.n_cohort AS retention_ppm
      |FROM cells ce JOIN sizes s ON ce.cohort_day = s.cohort_day
      |ORDER BY ce.cohort_day, ce.offset_w""".stripMargin))

  /** q318: sequential probability ratio test (Wald's SPRT) over the
    * daily purchase-conversion rate — the ALWAYS-VALID monitor beside
    * q303's EWMA chart (the chart flags level exits; SPRT accumulates
    * evidence between H₀: p = 0.04 and H₁: p = 0.05 and STOPS the
    * experiment the day the log-likelihood ratio crosses a boundary,
    * with error rates guaranteed at any peeking frequency). Per day
    * the LLR increment is k·ln(p₁/p₀) + (n−k)·ln(q₁/q₀) — integer
    * counts times two shared double constants (sub-ULP noise at e6
    * rounding); the cumulative sum routes through the DECIMAL(38,6)
    * window (dsumOver) so partitioning never reorders it; boundaries
    * ln((1−β)/α), ln(β/(1−α)) at α = β = 0.05. Calendar-bounded
    * frame, one ordered window. */
  val q318 = GQuery(
    "q318_sprt_monitor",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .select(to_date(col("ts")).as("day"),
          (col("event_type") === "purchase").as("hit"))
        .groupBy(col("day"))
        .agg(lcount(lit(1)).as("n"),
          coalesce(sum(when(col("hit"), 1L)), lit(0L)).as("k"))
      daily
        .withColumn("llr_day", expr(
          """CAST(k AS DOUBLE) * ln(CAST(0.05 AS DOUBLE) / CAST(0.04 AS DOUBLE))
            |+ CAST(n - k AS DOUBLE)
            |  * ln(CAST(0.95 AS DOUBLE) / CAST(0.96 AS DOUBLE))""".stripMargin))
        .withColumn("llr_cum", dsumOver(col("llr_day"),
          W.orderBy(col("day")).rowsBetween(W.unboundedPreceding, W.currentRow)))
        .select(col("day"), col("n"), col("k"),
          round(col("llr_cum"), 6).as("llr_cum"),
          expr("""CASE WHEN llr_cum >= ln(CAST(0.95 AS DOUBLE) / CAST(0.05 AS DOUBLE))
            |THEN 'accept_h1'
            |WHEN llr_cum <= ln(CAST(0.05 AS DOUBLE) / CAST(0.95 AS DOUBLE))
            |THEN 'accept_h0'
            |ELSE 'continue' END""".stripMargin).as("decision"))
        .orderBy(col("day"))
    },
    Some("""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
      |    COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 END)
      |      AS BIGINT), 0) AS k
      |  FROM events GROUP BY 1),
      |llr AS (
      |  SELECT day, n, k,
      |    CAST(k AS DOUBLE) * ln(CAST(0.05 AS DOUBLE) / CAST(0.04 AS DOUBLE))
      |      + CAST(n - k AS DOUBLE)
      |        * ln(CAST(0.95 AS DOUBLE) / CAST(0.96 AS DOUBLE)) AS llr_day
      |  FROM daily),
      |cum AS (
      |  SELECT day, n, k,
      |    CAST(SUM(CAST(llr_day AS DECIMAL(38,6)))
      |      OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS llr_cum
      |  FROM llr)
      |SELECT day, n, k, round(llr_cum, 6) AS llr_cum,
      |  CASE WHEN llr_cum >= ln(CAST(0.95 AS DOUBLE) / CAST(0.05 AS DOUBLE))
      |  THEN 'accept_h1'
      |  WHEN llr_cum <= ln(CAST(0.05 AS DOUBLE) / CAST(0.95 AS DOUBLE))
      |  THEN 'accept_h0'
      |  ELSE 'continue' END AS decision
      |FROM cum ORDER BY day""".stripMargin))

  /** q320: event-time lateness census — the watermark-tuning signal a
    * streaming deployment reads before choosing `withWatermark`
    * bounds: each event's lateness is how far its EVENT time sits
    * behind the key's running event-time maximum in ARRIVAL order,
    * and the census buckets lateness into powers-of-two seconds —
    * the histogram's tail mass IS the fraction of state a given
    * watermark would drop. The synthetic events table is perfectly
    * ordered (event_id ≡ time order, zero lateness), so arrival is
    * modeled as a DETERMINISTIC md5 transit delay of 0–599 s per
    * event (the q290 synthetic-workload discipline — both engines
    * replay the same arrival log); lateness is measured per user (the
    * stream's key — per-key lateness bounds the global watermark
    * choice). floor(log2) is taken on the INTEGER path
    * (length(bin(n))−1) because ln-based log2 can land a last-ULP
    * short exactly AT the power-of-two bucket edges. Exact integer
    * seconds, one per-user ordered window + one bounded groupBy. */
  val q320 = GQuery(
    "q320_lateness_census",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val lat = events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("sec"))
        .withColumn("arrival",
          col("sec") + expr(
            "CAST(conv(substring(md5(concat('late-', CAST(event_id AS STRING))), 1, 7), 16, 10) AS BIGINT) % 600"))
        .withColumn("late_s",
          max(col("sec")).over(W.partitionBy(col("user_id"))
            .orderBy(col("arrival"), col("event_id"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)) - col("sec"))
      // floor(log2(n)) as an INTEGER path — length of the binary string
      // minus one — because log(2, x) = ln(x)/ln(2) can land a last-ULP
      // short of an integer exactly AT the power-of-two bucket edges
      lat.select(
          when(col("late_s") === 0, lit(-1L))
            .otherwise((length(expr("bin(late_s)")) - 1).cast("long"))
            .as("bucket_log2"))
        .groupBy(col("bucket_log2"))
        .agg(lcount(lit(1)).as("n_events"))
        .orderBy(col("bucket_log2"))
    },
    Some("""WITH arr AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    CAST(floor(epoch(ts)) AS BIGINT)
      |      + CAST(('0x' || substr(md5('late-' || CAST(event_id AS VARCHAR)), 1, 7))
      |          AS BIGINT) % 600 AS arrival
      |  FROM events),
      |lat AS (
      |  SELECT
      |    MAX(sec) OVER (PARTITION BY user_id
      |      ORDER BY arrival, event_id ROWS UNBOUNDED PRECEDING)
      |      - sec AS late_s
      |  FROM arr),
      |b AS (
      |  SELECT CASE WHEN late_s = 0 THEN -1
      |    ELSE CAST(length(bin(late_s)) - 1 AS BIGINT) END AS bucket_log2
      |  FROM lat)
      |SELECT bucket_log2, CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM b GROUP BY bucket_log2 ORDER BY bucket_log2""".stripMargin))

  /** q322: Kaplan–Meier time-to-conversion
    * ([[graft.stats.Survival.kaplanMeier]]) — the survival census
    * beside q317's retention matrix: per user, the duration in whole
    * hours from their FIRST event to their FIRST purchase, observed
    * inside a 72-hour study window and right-CENSORED at 72 h
    * otherwise (the administrative-censoring design every
    * time-to-event analysis runs — censored users still count in
    * n_risk for every earlier step, which is exactly what a naive
    * conversion-rate-by-hour histogram gets wrong). The per-user
    * frame is one shuffle on user_id; the KM recurrence runs on the
    * ≤73-row distinct-duration frame. The oracle replays n_risk, the
    * step factors, and the decimal-routed log-sum product. */
  val q322 = GQuery(
    "q322_kaplan_meier",
    (s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), unix_timestamp(col("ts")).as("sec"),
          col("event_type"))
      val perUser = ev.groupBy(col("user_id"))
        .agg(min(col("sec")).as("s0"),
          min(when(col("event_type") === "purchase", col("sec"))).as("sp"))
      val units = perUser
        .withColumn("h", expr("(sp - s0) div 3600"))
        .select(
          when(col("h").isNotNull && col("h") <= 72, col("h"))
            .otherwise(lit(72L)).as("dur"),
          (col("h").isNotNull && col("h") <= 72).as("observed"))
      graft.stats.Survival.kaplanMeier(units, "dur", "observed")
    },
    Some("""WITH u AS (
      |  SELECT user_id, MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS s0,
      |    MIN(CASE WHEN event_type = 'purchase'
      |        THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS sp
      |  FROM events GROUP BY user_id),
      |dur AS (
      |  SELECT CASE WHEN (sp - s0) // 3600 <= 72
      |      THEN (sp - s0) // 3600 ELSE 72 END AS t,
      |    (sp IS NOT NULL AND (sp - s0) // 3600 <= 72) AS observed
      |  FROM u),
      |byt AS (
      |  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_at,
      |    COALESCE(CAST(SUM(CASE WHEN observed THEN 1 END) AS BIGINT), 0)
      |      AS d_events
      |  FROM dur GROUP BY t),
      |w AS (
      |  SELECT t, n_at, d_events, n_at - d_events AS n_censored,
      |    CAST(SUM(n_at) OVER ()
      |      - COALESCE(SUM(n_at) OVER (ORDER BY t
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS n_risk
      |  FROM byt),
      |f AS (
      |  SELECT t, n_risk, d_events, n_censored,
      |    CASE WHEN d_events = 0 THEN 0.0
      |      WHEN d_events < n_risk
      |      THEN ln(1.0 - CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE))
      |      ELSE 0.0 END AS ln_factor,
      |    CASE WHEN d_events >= n_risk THEN 1 ELSE 0 END AS z
      |  FROM w),
      |c AS (
      |  SELECT t, n_risk, d_events, n_censored,
      |    MAX(z) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS hit_zero,
      |    CAST(SUM(CAST(ln_factor AS DECIMAL(38,6)))
      |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS lns
      |  FROM f)
      |SELECT t, n_risk, d_events, n_censored,
      |  CASE WHEN hit_zero = 1 THEN 0.0 ELSE round(exp(lns), 6) END AS survival
      |FROM c WHERE d_events > 0 ORDER BY t""".stripMargin))

  /** q323: multi-touch attribution — the marketing-analytics census
    * behind q181's funnel: every purchase is a CONVERSION, every
    * non-purchase event by the same user in the 7-day lookback window
    * is a TOUCH, and each channel (event_type) is credited under
    * three standard models at once: first-touch (1 to the earliest
    * touch), last-touch (1 to the latest), and linear (1/n to each of
    * the conversion's n touches, carried as exact truncating-÷ ppm so
    * the credit ledger stays integer). Ties inside a conversion break
    * on (ts, event_id). Scale shape: the touch↔conversion pairing is
    * a per-user bounded range join (SMJ on user_id + residual time
    * band); the rank windows partition by conversion id, never by a
    * fact-wide key. */
  val q323 = GQuery(
    "q323_touch_attribution",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = events(s, d)
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("conv_id"), col("ts").as("cts"))
      val touch = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_id"), col("event_type").as("channel"),
          col("ts"))
      val pairs = conv.join(touch, Seq("user_id"))
        .filter(col("ts") < col("cts") &&
          col("ts") >= col("cts") - expr("INTERVAL 7 DAY"))
      val r = pairs
        .withColumn("rf", row_number().over(W.partitionBy(col("conv_id"))
          .orderBy(col("ts").asc, col("event_id").asc)))
        .withColumn("rl", row_number().over(W.partitionBy(col("conv_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
        .withColumn("n", count(lit(1)).over(W.partitionBy(col("conv_id"))))
      r.groupBy(col("channel"))
        .agg(
          coalesce(sum(when(col("rf") === 1, 1L)), lit(0L)).as("first_touch"),
          coalesce(sum(when(col("rl") === 1, 1L)), lit(0L)).as("last_touch"),
          sum(expr("1000000 div n")).as("linear_e6"),
          lcount(lit(1)).as("n_touches"))
        .orderBy(col("channel"))
    },
    Some("""WITH conv AS (
      |  SELECT user_id, event_id AS conv_id, ts AS cts
      |  FROM events WHERE event_type = 'purchase'),
      |touch AS (
      |  SELECT user_id, event_id, event_type AS channel, ts
      |  FROM events WHERE event_type <> 'purchase'),
      |pairs AS (
      |  SELECT c.conv_id, t.event_id, t.channel, t.ts
      |  FROM conv c JOIN touch t ON c.user_id = t.user_id
      |   AND t.ts < c.cts AND t.ts >= c.cts - INTERVAL 7 DAY),
      |r AS (
      |  SELECT conv_id, channel,
      |    row_number() OVER (PARTITION BY conv_id
      |                       ORDER BY ts ASC, event_id ASC) AS rf,
      |    row_number() OVER (PARTITION BY conv_id
      |                       ORDER BY ts DESC, event_id DESC) AS rl,
      |    COUNT(*) OVER (PARTITION BY conv_id) AS n
      |  FROM pairs)
      |SELECT channel,
      |  COALESCE(CAST(SUM(CASE WHEN rf = 1 THEN 1 END) AS BIGINT), 0)
      |    AS first_touch,
      |  COALESCE(CAST(SUM(CASE WHEN rl = 1 THEN 1 END) AS BIGINT), 0)
      |    AS last_touch,
      |  CAST(SUM(1000000 // n) AS BIGINT) AS linear_e6,
      |  CAST(COUNT(*) AS BIGINT) AS n_touches
      |FROM r GROUP BY channel ORDER BY channel""".stripMargin))

  /** q326: offline UCB1 index census — the bandit-monitoring face of
    * the experiment family (q318 SPRT decides when to STOP; this
    * shows what an index policy WOULD have pulled each day from the
    * logged data): arm = event_type, reward = 1 when the event's
    * value clears 50, and each day's UCB1 index uses only data
    * through the PREVIOUS day (mean + sqrt(2 ln N / n)). Days before
    * every arm has a pull are warm-up and omitted (n = 0 has no
    * index). The daily agg is the only fact-sized pass; the spine ×
    * cumulative windows run on the days×arms frame. Doubles are
    * identical on both engines (one division, ln, sqrt), rounded at
    * e6; the argmax tie-breaks on arm name. */
  val q326 = GQuery(
    "q326_ucb1_census",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type").as("arm"))
        .agg(lcount(lit(1)).as("n"),
          coalesce(sum(when(col("value") > 50.0, 1L)), lit(0L)).as("w"))
      val spine = daily.select(col("day")).distinct()
        .crossJoin(daily.select(col("arm")).distinct())
      val filled = spine.join(daily, Seq("day", "arm"), "left")
        .select(col("day"), col("arm"),
          coalesce(col("n"), lit(0L)).as("n"), coalesce(col("w"), lit(0L)).as("w"))
      val prev = W.partitionBy(col("arm")).orderBy(col("day"))
        .rowsBetween(W.unboundedPreceding, -1)
      val cum = filled
        .withColumn("n_cum", coalesce(sum(col("n")).over(prev), lit(0L)))
        .withColumn("w_cum", coalesce(sum(col("w")).over(prev), lit(0L)))
        .withColumn("big_n", sum(col("n_cum")).over(W.partitionBy(col("day"))))
        .withColumn("min_n", min(col("n_cum")).over(W.partitionBy(col("day"))))
        .filter(col("min_n") > 0)
        .withColumn("ucb",
          col("w_cum").cast("double") / col("n_cum").cast("double")
            + sqrt(lit(2.0) * log(col("big_n").cast("double"))
              / col("n_cum").cast("double")))
      cum.withColumn("chosen",
          row_number().over(W.partitionBy(col("day"))
            .orderBy(col("ucb").desc, col("arm").asc)) === 1)
        .select(col("day"), col("arm"), col("n_cum"), col("w_cum"),
          round(col("ucb"), 6).as("ucb"), col("chosen"))
        .orderBy(col("day"), col("arm"))
    },
    Some("""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type AS arm,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    COALESCE(CAST(SUM(CASE WHEN value > 50.0 THEN 1 END) AS BIGINT), 0)
      |      AS w
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT d.day, a.arm FROM (SELECT DISTINCT day FROM daily) d
      |  CROSS JOIN (SELECT DISTINCT arm FROM daily) a),
      |filled AS (
      |  SELECT s.day, s.arm, COALESCE(dd.n, 0) AS n, COALESCE(dd.w, 0) AS w
      |  FROM spine s LEFT JOIN daily dd ON s.day = dd.day AND s.arm = dd.arm),
      |cum AS (
      |  SELECT day, arm,
      |    CAST(COALESCE(SUM(n) OVER (PARTITION BY arm ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS n_cum,
      |    CAST(COALESCE(SUM(w) OVER (PARTITION BY arm ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS w_cum
      |  FROM filled),
      |tot AS (
      |  SELECT day, arm, n_cum, w_cum,
      |    SUM(n_cum) OVER (PARTITION BY day) AS big_n,
      |    MIN(n_cum) OVER (PARTITION BY day) AS min_n
      |  FROM cum),
      |u AS (
      |  SELECT day, arm, n_cum, w_cum,
      |    CAST(w_cum AS DOUBLE) / CAST(n_cum AS DOUBLE)
      |      + sqrt(2.0 * ln(CAST(big_n AS DOUBLE)) / CAST(n_cum AS DOUBLE))
      |      AS ucb
      |  FROM tot WHERE min_n > 0)
      |SELECT day, arm, n_cum, w_cum, round(ucb, 6) AS ucb,
      |  (row_number() OVER (PARTITION BY day
      |     ORDER BY ucb DESC, arm ASC) = 1) AS chosen
      |FROM u ORDER BY day, arm""".stripMargin))

  /** q329: gap-constrained sequential-pattern mining (PrefixSpan-style
    * support counting, Pei et al. 2001) — the ORDER-sensitive
    * counterpart of q278's market baskets and q280's consecutive
    * transitions: a user supports pattern ⟨t₁,t₂,t₃⟩ when the three
    * types occur as a SUBSEQUENCE with at most 2 intervening events
    * between consecutive elements (gap ≤ 3 positions). Each event
    * carries its ≤3 successors through a lead() window (LINEAR in
    * events — a user-keyed banded self-join would enumerate n² pairs
    * per user before the band filter bites); the second hop is one
    * equi-join back on the (user, position) key. Support is DISTINCT
    * users, patterns below 5 supporters are pruned.
    * Output: pattern, n_users, n_matches (total embeddings). */
  val q329 = GQuery(
    "q329_sequence_patterns",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pos = events(s, d)
        .select(col("user_id"), col("event_type"),
          row_number().over(w).as("rn"))
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("rn"))
      val succ = pos.withColumn("nx", array((1 to 3).map(k =>
          struct(lead(col("event_type"), k).over(w2).as("t"),
            (col("rn") + k).as("r"))): _*))
      val hop1 = succ
        .select(col("user_id"), col("event_type").as("t1"),
          explode(col("nx")).as("x"))
        .filter(col("x.t").isNotNull)
        .select(col("user_id"), col("t1"), col("x.t").as("t2"),
          col("x.r").as("r2"))
      val emb = hop1.join(
          succ.select(col("user_id"), col("rn").as("r2"), col("nx")),
          Seq("user_id", "r2"))
        .select(col("user_id"), col("t1"), col("t2"),
          explode(col("nx")).as("y"))
        .filter(col("y.t").isNotNull)
        .select(col("user_id"), col("t1"), col("t2"), col("y.t").as("t3"))
      emb.groupBy(col("t1"), col("t2"), col("t3"))
        .agg(countDistinct(col("user_id")).cast("long").as("n_users"),
          lcount(lit(1)).as("n_matches"))
        .filter(col("n_users") >= 5)
        .orderBy(col("t1"), col("t2"), col("t3"))
    },
    Some("""WITH pos AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events),
      |emb AS (
      |  SELECT a.user_id, a.event_type AS t1, b.event_type AS t2,
      |    c.event_type AS t3
      |  FROM pos a
      |  JOIN pos b ON a.user_id = b.user_id
      |   AND b.rn > a.rn AND b.rn <= a.rn + 3
      |  JOIN pos c ON b.user_id = c.user_id
      |   AND c.rn > b.rn AND c.rn <= b.rn + 3)
      |SELECT t1, t2, t3,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(*) AS BIGINT) AS n_matches
      |FROM emb GROUP BY t1, t2, t3
      |HAVING COUNT(DISTINCT user_id) >= 5
      |ORDER BY t1, t2, t3""".stripMargin))

  /** q354: interrupted time-series analysis (segmented regression at
    * a KNOWN breakpoint) — the effect-estimation complement of q279's
    * CUSUM (CUSUM finds an unknown change-point; ITS quantifies the
    * level and slope change at a designated intervention date, the
    * standard policy/release-impact design): two independent OLS fits
    * on the daily purchase-revenue series split at the calendar
    * midpoint, reported with the level change AT the breakpoint and
    * the slope change. The X-moments are exact integers
    * (decimal-routed day indexes), the y-moments decimal-routed, and
    * both fits come out of ONE conditional aggregate over the landed
    * calendar-bounded daily frame. */
  val q354 = GQuery(
    "q354_interrupted_ts",
    (s, d) => {
      val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
      val daily0 = events(s, d).filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(dsum(col("value")).as("y"))
      val mind = daily0.agg(min(col("day")).as("d0"),
        max(col("day")).as("d1"))
      val daily = daily0.crossJoin(broadcast(mind))
        .select(datediff(col("day"), col("d0")).cast("long").as("t"),
          col("y"),
          expr("CAST(datediff(d1, d0) AS BIGINT) div 2").as("t0"))
        .withColumn("pre", col("t") < col("t0"))
      def seg(p: org.apache.spark.sql.Column) = Seq(
        sum(when(p, 1L)).cast("long"),
        sum(when(p, col("t")).cast(dec0)),
        sum(when(p, col("t") * col("t")).cast(dec0)),
        dsum(when(p, col("y"))),
        dsum(when(p, col("t").cast("double") * col("y"))))
      val m = daily.agg(
        seg(col("pre"))(0).as("n1"), seg(col("pre"))(1).as("st1"),
        seg(col("pre"))(2).as("stt1"), seg(col("pre"))(3).as("sy1"),
        seg(col("pre"))(4).as("sty1"),
        seg(!col("pre"))(0).as("n2"), seg(!col("pre"))(1).as("st2"),
        seg(!col("pre"))(2).as("stt2"), seg(!col("pre"))(3).as("sy2"),
        seg(!col("pre"))(4).as("sty2"),
        max(col("t0")).as("t0"))
      def fit(n: String, st: String, stt: String, sy: String, sty: String) = {
        val b = (col(n).cast("double") * col(sty)
          - col(st).cast("double") * col(sy)) /
          (col(n).cast("double") * col(stt).cast("double")
            - col(st).cast("double") * col(st).cast("double"))
        val a = (col(sy) - b * col(st).cast("double")) / col(n).cast("double")
        (a, b)
      }
      val (a1, b1) = fit("n1", "st1", "stt1", "sy1", "sty1")
      val (a2, b2) = fit("n2", "st2", "stt2", "sy2", "sty2")
      m.select(col("n1"), col("n2"), col("t0"),
        round(a1, 6).as("a_pre"), round(b1, 6).as("b_pre"),
        round(a2, 6).as("a_post"), round(b2, 6).as("b_post"),
        round((a2 + b2 * col("t0").cast("double"))
          - (a1 + b1 * col("t0").cast("double")), 6).as("level_change"),
        round(b2 - b1, 6).as("slope_change"))
    },
    Some(s"""WITH daily0 AS (
      |  SELECT CAST(ts AS DATE) AS day, ${sqlDsum("value")} AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |mind AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily0),
      |daily AS (
      |  SELECT CAST(day - d0 AS BIGINT) AS t, y,
      |    CAST(d1 - d0 AS BIGINT) // 2 AS t0,
      |    (CAST(day - d0 AS BIGINT) < CAST(d1 - d0 AS BIGINT) // 2) AS pre
      |  FROM daily0 CROSS JOIN mind),
      |m AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN pre THEN 1 END) AS BIGINT) AS n1,
      |    SUM(CASE WHEN pre THEN CAST(t AS HUGEINT) END) AS st1,
      |    SUM(CASE WHEN pre THEN CAST(t AS HUGEINT) * t END) AS stt1,
      |    ${sqlDsum("CASE WHEN pre THEN y END")} AS sy1,
      |    ${sqlDsum("CASE WHEN pre THEN CAST(t AS DOUBLE) * y END")} AS sty1,
      |    CAST(SUM(CASE WHEN NOT pre THEN 1 END) AS BIGINT) AS n2,
      |    SUM(CASE WHEN NOT pre THEN CAST(t AS HUGEINT) END) AS st2,
      |    SUM(CASE WHEN NOT pre THEN CAST(t AS HUGEINT) * t END) AS stt2,
      |    ${sqlDsum("CASE WHEN NOT pre THEN y END")} AS sy2,
      |    ${sqlDsum("CASE WHEN NOT pre THEN CAST(t AS DOUBLE) * y END")}
      |      AS sty2,
      |    MAX(t0) AS t0
      |  FROM daily),
      |f AS (
      |  SELECT n1, n2, t0,
      |    (CAST(n1 AS DOUBLE) * sty1 - CAST(st1 AS DOUBLE) * sy1)
      |      / (CAST(n1 AS DOUBLE) * CAST(stt1 AS DOUBLE)
      |        - CAST(st1 AS DOUBLE) * CAST(st1 AS DOUBLE)) AS b1,
      |    (CAST(n2 AS DOUBLE) * sty2 - CAST(st2 AS DOUBLE) * sy2)
      |      / (CAST(n2 AS DOUBLE) * CAST(stt2 AS DOUBLE)
      |        - CAST(st2 AS DOUBLE) * CAST(st2 AS DOUBLE)) AS b2,
      |    sy1, st1, sy2, st2
      |  FROM m),
      |g AS (
      |  SELECT n1, n2, t0, b1, b2,
      |    (sy1 - b1 * CAST(st1 AS DOUBLE)) / CAST(n1 AS DOUBLE) AS a1,
      |    (sy2 - b2 * CAST(st2 AS DOUBLE)) / CAST(n2 AS DOUBLE) AS a2
      |  FROM f)
      |SELECT n1, n2, t0, round(a1, 6) AS a_pre, round(b1, 6) AS b_pre,
      |  round(a2, 6) AS a_post, round(b2, 6) AS b_post,
      |  round((a2 + b2 * CAST(t0 AS DOUBLE))
      |    - (a1 + b1 * CAST(t0 AS DOUBLE)), 6) AS level_change,
      |  round(b2 - b1, 6) AS slope_change
      |FROM g""".stripMargin))

  /** q363: data-observability census (volume anomaly detection) — the
    * pipeline-health monitor every ingestion runs beside the
    * contract checks (q171 gates SCHEMA; this gates ARRIVAL MASS):
    * each day's event volume and active-user count are scored
    * against the trailing 7-day window's exact median ± 3·MAD
    * (median/MAD computed from the SORTED trailing array — 7 bounded
    * elements per day, so the robust band costs one array sort, no
    * second aggregation pass), and days outside either band are
    * incidents. Days without a full trailing week are warm-up and
    * unflagged. The daily rollup is the only fact-sized pass; the
    * band logic runs on the calendar frame. */
  val q363 = GQuery(
    "q363_observability",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(lcount(lit(1)).as("volume"),
          countDistinct(col("user_id")).cast("long").as("n_users"))
      val w7 = W.orderBy(col("day")).rowsBetween(-7, -1)
      // try_element_at: warm-up days have short trailing windows (ANSI
      // element_at errors there); DuckDB's list[4] is NULL there too
      val withArr = daily
        .withColumn("va", sort_array(collect_list(col("volume")).over(w7)))
        .withColumn("ua", sort_array(collect_list(col("n_users")).over(w7)))
        .withColumn("vmed", expr("try_element_at(va, 4)"))
        .withColumn("umed", expr("try_element_at(ua, 4)"))
        .withColumn("vmad", expr(
          "try_element_at(sort_array(transform(va, v -> abs(v - try_element_at(va, 4)))), 4)"))
        .withColumn("umad", expr(
          "try_element_at(sort_array(transform(ua, v -> abs(v - try_element_at(ua, 4)))), 4)"))
      withArr.select(col("day"), col("volume"), col("n_users"),
          when(size(col("va")) === 7, col("vmed")).as("vol_med7"),
          when(size(col("va")) === 7, col("vmad")).as("vol_mad7"),
          when(size(col("ua")) === 7, col("umed")).as("usr_med7"),
          (size(col("va")) === 7 &&
            abs(col("volume") - col("vmed")) > lit(3L) * col("vmad"))
            .as("vol_incident"),
          (size(col("ua")) === 7 &&
            abs(col("n_users") - col("umed")) > lit(3L) * col("umad"))
            .as("usr_incident"))
        .orderBy(col("day"))
    },
    Some("""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS volume,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM events GROUP BY 1),
      |wins AS (
      |  SELECT day, volume, n_users,
      |    list_sort(list(volume) OVER (ORDER BY day
      |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) AS va,
      |    list_sort(list(n_users) OVER (ORDER BY day
      |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) AS ua
      |  FROM daily),
      |bands AS (
      |  SELECT day, volume, n_users, COALESCE(len(va), 0) AS vw,
      |    COALESCE(len(ua), 0) AS uw,
      |    va[4] AS vmed, ua[4] AS umed,
      |    list_sort(list_transform(va, v -> abs(v - va[4])))[4] AS vmad,
      |    list_sort(list_transform(ua, v -> abs(v - ua[4])))[4] AS umad
      |  FROM wins)
      |SELECT day, volume, n_users,
      |  CASE WHEN vw = 7 THEN vmed END AS vol_med7,
      |  CASE WHEN vw = 7 THEN vmad END AS vol_mad7,
      |  CASE WHEN uw = 7 THEN umed END AS usr_med7,
      |  (vw = 7 AND abs(volume - vmed) > 3 * vmad) AS vol_incident,
      |  (uw = 7 AND abs(n_users - umed) > 3 * umad) AS usr_incident
      |FROM bands ORDER BY day""".stripMargin))

  /** q373: Markov stationary distribution + entropy rate — the
    * long-run face of the q280 transition matrix (and the information
    * content q330's removal effects implicitly price): 5 unrolled
    * power-iteration steps π←πP from the uniform start, each a join +
    * grouped sum over the STATES²-bounded transition frame (the fact
    * scan happens once, building P; iteration cost is independent of
    * data size), then the entropy rate H = −Σ_s π_s Σ_t p_st·ln p_st.
    * Probabilities stay continuous doubles (single IEEE division per
    * cell); iteration sums are decimal-routed so π is
    * partition-independent; ln terms follow the q146 parity
    * discipline. */
  val q373 = GQuery(
    "q373_stationary_entropy",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tr = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(lcount(lit(1)).as("n"))
      val fromTot = tr.groupBy(col("from_type")).agg(sum(col("n")).as("nf"))
      // the fact-scale work (window lead + two groupings) happens ONCE:
      // the states^2-bounded P lazily checkpoints, so the 5 iteration
      // steps + the entropy pass probe a pinned 25-row frame instead of
      // re-deriving the transition matrix per reference (the q267
      // edge-frame lesson)
      val pmat = tr.join(broadcast(fromTot), Seq("from_type"))
        .select(col("from_type"), col("to_type"),
          (col("n").cast("double") / col("nf")).as("p"))
        .localCheckpoint(eager = false)
      val nStates = pmat.select(col("from_type")).distinct()
        .agg(lcount(lit(1)).as("k"))
      val pi0 = pmat.select(col("from_type").as("st")).distinct()
        .crossJoin(broadcast(nStates))
        .select(col("st"), (lit(1.0) / col("k")).as("pi"))
      val pi5 = (1 to 5).foldLeft(pi0) { (pi, _) =>
        pmat.join(pi.select(col("st").as("from_type"), col("pi")),
            Seq("from_type"))
          .groupBy(col("to_type").as("st"))
          .agg(dsum(col("pi") * col("p")).as("pi"))
      }
      val rowH = pmat.groupBy(col("from_type").as("st"))
        .agg((lit(0.0) - dsum(col("p") * log(col("p")))).as("h_row"))
      val hRate = pi5.join(rowH, Seq("st"))
        .agg(dsum(col("pi") * col("h_row")).as("h_rate"))
      pi5.join(rowH, Seq("st")).crossJoin(broadcast(hRate))
        .select(col("st"), round(col("pi"), 6).as("pi"),
          round(col("h_row"), 6).as("h_row"),
          round(col("h_rate"), 6).as("entropy_rate"))
        .orderBy(col("st"))
    },
    Some {
      def step(prev: String, out: String) =
        s"""$out AS (
      |  SELECT p.to_type AS st, ${sqlDsum("q.pi * p.p")} AS pi
      |  FROM pmat p JOIN $prev q ON p.from_type = q.st
      |  GROUP BY p.to_type)"""
      s"""WITH tr AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |cnt AS (
      |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS nf FROM cnt GROUP BY 1),
      |pmat AS (
      |  SELECT c.from_type, c.to_type, CAST(c.n AS DOUBLE) / t.nf AS p
      |  FROM cnt c JOIN tot t ON c.from_type = t.from_type),
      |ns AS (
      |  SELECT CAST(COUNT(DISTINCT from_type) AS BIGINT) AS k FROM pmat),
      |p0 AS (
      |  SELECT from_type AS st, CAST(1 AS DOUBLE) / ns.k AS pi
      |  FROM (SELECT DISTINCT from_type FROM pmat) CROSS JOIN ns),
      |${step("p0", "p1")},
      |${step("p1", "p2")},
      |${step("p2", "p3")},
      |${step("p3", "p4")},
      |${step("p4", "p5")},
      |rh AS (
      |  SELECT from_type AS st,
      |    0.0 - ${sqlDsum("p * ln(p)")} AS h_row
      |  FROM pmat GROUP BY from_type),
      |hr AS (
      |  SELECT ${sqlDsum("p5.pi * rh.h_row")} AS h_rate
      |  FROM p5 JOIN rh ON p5.st = rh.st)
      |SELECT p5.st, round(p5.pi, 6) AS pi, round(rh.h_row, 6) AS h_row,
      |  round(hr.h_rate, 6) AS entropy_rate
      |FROM p5 JOIN rh ON p5.st = rh.st CROSS JOIN hr
      |ORDER BY p5.st""".stripMargin
    })

  /** q374: exact Shapley-value channel attribution (Shapley 1953) —
    * the axiomatic member of the attribution ladder (q323 rule-based
    * touches, q330 Markov removal effects): each non-purchase event
    * type is a channel, each user's touched-channel set is a bitmask,
    * and v(S) = mean purchase spend over users with EXACTLY that
    * mask. With the channel universe bounded (k types ⇒ 2^k masks —
    * independent of user count), the exact marginal-contribution sum
    * φ_c = Σ_{S∌c} |S|!(k−1−|S|)!/k!·(v(S∪c)−v(S)) runs on the
    * mask-bounded frame; both engines spell the factorial weight and
    * coalition lookups identically (unobserved masks contribute
    * v = 0). The fact-scale work is ONE distinct-pass + ONE grouped
    * sum; everything after is 2^k-bounded. */
  val q374 = GQuery(
    "q374_shapley_attribution",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("ch"))
      val ev = events(s, d)
      val chans = ev.filter(col("event_type") =!= "purchase")
        .select(col("event_type").as("ch")).distinct()
        .withColumn("bit", (row_number().over(w) - 1).cast("long"))
      val k = chans.agg(lcount(lit(1)).as("k"))
      val touched = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type").as("ch")).distinct()
        .join(broadcast(chans), Seq("ch"))
      val userMask = ev.select(col("user_id")).distinct()
        .join(touched.groupBy(col("user_id"))
            .agg(sum(expr("CAST(shiftleft(1, bit) AS BIGINT)")).as("m0")),
          Seq("user_id"), "left")
        .select(col("user_id"), coalesce(col("m0"), lit(0L)).as("mask"))
      val conv = ev.groupBy(col("user_id"))
        .agg(coalesce(dsum(when(col("event_type") === "purchase",
          col("value"))), lit(0.0)).as("cv"))
      val vObs = userMask.join(conv, Seq("user_id"))
        .groupBy(col("mask"))
        .agg(lcount(lit(1)).as("n_users"), (dsum(col("cv")) / count(lit(1)))
          .as("v"))
      val masks = k.select(col("k"),
          explode(sequence(lit(0L),
            expr("CAST(shiftleft(1, k) AS BIGINT)") - 1)).as("m"))
      // v is referenced twice in the marginal join (S and S∪{c}) — land
      // the 2^k-bounded coalition-value frame once so the fact-scale
      // mask/conversion aggregation doesn't run per reference
      val vAll = masks.join(vObs.select(col("mask").as("m"), col("v")),
          Seq("m"), "left")
        .select(col("m"), col("k"), coalesce(col("v"), lit(0.0)).as("v"))
        .localCheckpoint(eager = false)
      val terms = vAll
        .crossJoin(broadcast(chans))
        .filter(col("m").bitwiseAND(
          expr("CAST(shiftleft(1, bit) AS BIGINT)")) === 0)
        .join(vAll.select(col("m").as("mw"), col("v").as("vw")),
          col("mw") === col("m") + expr("CAST(shiftleft(1, bit) AS BIGINT)"))
        .withColumn("wt",
          factorial(bit_count(col("m")).cast("int")).cast("double")
            * factorial((col("k") - 1 - bit_count(col("m"))).cast("int"))
              .cast("double")
            / factorial(col("k").cast("int")).cast("double"))
      val phi = terms.groupBy(col("ch"), col("bit"))
        .agg(dsum(col("wt") * (col("vw") - col("v"))).as("phi"))
      val touches = touched.groupBy(col("ch"))
        .agg(lcount(lit(1)).as("n_users_touched"))
      phi.join(touches, Seq("ch"))
        .select(col("ch"), col("bit"), col("n_users_touched"),
          round(col("phi"), 6).as("phi"))
        .orderBy(col("ch"))
    },
    Some(s"""WITH chans AS (
      |  SELECT ch, CAST(row_number() OVER (ORDER BY ch) - 1 AS BIGINT)
      |    AS bit
      |  FROM (SELECT DISTINCT event_type AS ch FROM events
      |        WHERE event_type <> 'purchase')),
      |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM chans),
      |touched AS (
      |  SELECT DISTINCT e.user_id, e.event_type AS ch
      |  FROM events e WHERE e.event_type <> 'purchase'),
      |tb AS (
      |  SELECT t.user_id, c.bit FROM touched t
      |  JOIN chans c ON t.ch = c.ch),
      |um AS (
      |  SELECT u.user_id, COALESCE(mm.m0, 0) AS mask
      |  FROM (SELECT DISTINCT user_id FROM events) u
      |  LEFT JOIN (SELECT user_id, CAST(SUM(1 << bit) AS BIGINT) AS m0
      |             FROM tb GROUP BY user_id) mm
      |    ON u.user_id = mm.user_id),
      |conv AS (
      |  SELECT user_id, COALESCE(${sqlDsum(
             "CASE WHEN event_type = 'purchase' THEN value END")}, 0.0)
      |    AS cv
      |  FROM events GROUP BY user_id),
      |vobs AS (
      |  SELECT um.mask, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    ${sqlDsum("conv.cv")} / COUNT(*) AS v
      |  FROM um JOIN conv ON um.user_id = conv.user_id
      |  GROUP BY um.mask),
      |masks AS (
      |  SELECT kk.k, u.m
      |  FROM kk, UNNEST(generate_series(0, (1 << kk.k) - 1)) AS u(m)),
      |vall AS (
      |  SELECT m.m, m.k, COALESCE(v.v, 0.0) AS v
      |  FROM masks m LEFT JOIN vobs v ON m.m = v.mask),
      |terms AS (
      |  SELECT c.ch, c.bit, a.m, a.k, a.v, b.v AS vw,
      |    CAST(factorial(CAST(bit_count(a.m) AS INTEGER)) AS DOUBLE)
      |      * CAST(factorial(CAST(a.k - 1 - bit_count(a.m) AS INTEGER))
      |          AS DOUBLE)
      |      / CAST(factorial(CAST(a.k AS INTEGER)) AS DOUBLE) AS wt
      |  FROM vall a CROSS JOIN chans c
      |  JOIN vall b ON b.m = a.m + (1 << c.bit)
      |  WHERE (a.m & (1 << c.bit)) = 0),
      |phi AS (
      |  SELECT ch, bit, ${sqlDsum("wt * (vw - v)")} AS phi
      |  FROM terms GROUP BY ch, bit),
      |tc AS (
      |  SELECT ch, CAST(COUNT(*) AS BIGINT) AS n_users_touched
      |  FROM touched GROUP BY ch)
      |SELECT p.ch, p.bit, t.n_users_touched, round(p.phi, 6) AS phi
      |FROM phi p JOIN tc t ON p.ch = t.ch
      |ORDER BY p.ch""".stripMargin))

  /** q388: k-step Markov absorption probabilities (k = 6) — the
    * "will this journey convert, and from where" number completing
    * the chain family (q280 transitions, q330 removal effects, q373
    * stationary): with purchase absorbing, b = Σ_{t=0..5} Qᵗ·R is
    * EXACTLY the probability of converting within 6 steps from each
    * transient state (a truncated fundamental-matrix solve with
    * defined semantics, not an approximation). Five unrolled
    * vector-multiply steps over the states²-bounded transient matrix
    * (landed once — iteration cost independent of the fact scan);
    * sums decimal-routed. */
  val q388 = GQuery(
    "q388_absorption_probability",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tr = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(lcount(lit(1)).as("n"))
      val fromTot = tr.groupBy(col("from_type")).agg(sum(col("n")).as("nf"))
      val pmat = tr.join(broadcast(fromTot), Seq("from_type"))
        .filter(col("from_type") =!= "purchase")
        .select(col("from_type"), col("to_type"),
          (col("n").cast("double") / col("nf")).as("p"))
        .localCheckpoint(eager = false)
      val qMat = pmat.filter(col("to_type") =!= "purchase")
      val r0 = pmat.filter(col("to_type") === "purchase")
        .select(col("from_type").as("st"), col("p").as("x"))
      val steps = (1 to 5).scanLeft(r0) { (x, _) =>
        qMat.join(x.select(col("st").as("to_type"), col("x")),
            Seq("to_type"))
          .groupBy(col("from_type").as("st"))
          .agg(dsum(col("p") * col("x")).as("x"))
      }
      val b = steps.map(_.select(col("st"), col("x")))
        .reduce(_ unionByName _)
        .groupBy(col("st"))
        .agg(sum(col("x").cast(graft.core.Exact.Dec)).cast("double")
          .as("b"))
      b.select(col("st"), round(col("b"), 6).as("p_convert_6"))
        .orderBy(col("st"))
    },
    Some {
      def step(prev: String, out: String) =
        s"""$out AS (
      |  SELECT q.from_type AS st, ${sqlDsum("q.p * x.x")} AS x
      |  FROM qm q JOIN $prev x ON q.to_type = x.st
      |  GROUP BY q.from_type)"""
      s"""WITH trr AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |cnt AS (
      |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM trr WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS nf FROM cnt GROUP BY 1),
      |pm AS (
      |  SELECT c.from_type, c.to_type, CAST(c.n AS DOUBLE) / t.nf AS p
      |  FROM cnt c JOIN tot t ON c.from_type = t.from_type
      |  WHERE c.from_type <> 'purchase'),
      |qm AS (SELECT * FROM pm WHERE to_type <> 'purchase'),
      |x0 AS (
      |  SELECT from_type AS st, p AS x FROM pm WHERE to_type = 'purchase'),
      |${step("x0", "x1")},
      |${step("x1", "x2")},
      |${step("x2", "x3")},
      |${step("x3", "x4")},
      |${step("x4", "x5")},
      |u AS (
      |  SELECT st, x FROM x0 UNION ALL SELECT st, x FROM x1
      |  UNION ALL SELECT st, x FROM x2 UNION ALL SELECT st, x FROM x3
      |  UNION ALL SELECT st, x FROM x4 UNION ALL SELECT st, x FROM x5)
      |SELECT st,
      |  round(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE), 6)
      |    AS p_convert_6
      |FROM u GROUP BY st ORDER BY st""".stripMargin
    })

  /** q392: periodogram — the spectral census completing the temporal
    * diagnostics (q272 decomposes a KNOWN weekly season; the
    * periodogram FINDS the season): daily purchase mass against
    * frequencies k/N for k = 1..10, P_k = (Σy·cos + i·Σy·sin)²/N via
    * two decimal-routed projection sums per frequency. The frequency
    * sweep is a bounded crossJoin onto the calendar-bounded daily
    * frame; trig outputs are high-entropy so the casts are safe. */
  val q392 = GQuery(
    "q392_periodogram",
    (s, d) => {
      val daily0 = events(s, d).filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(dsum(col("value")).as("y"))
      val mind = daily0.agg(min(col("day")).as("d0"),
        lcount(lit(1)).as("nn"))
      val daily = daily0.crossJoin(broadcast(mind))
        .select(datediff(col("day"), col("d0")).cast("long").as("t"),
          col("y"), col("nn"))
      val ks = mind.select(explode(sequence(lit(1L), lit(10L))).as("k"))
      daily.crossJoin(broadcast(ks))
        .withColumn("theta",
          lit(2.0) * lit(math.Pi) * col("k") * col("t")
            / col("nn").cast("double"))
        .groupBy(col("k"), col("nn"))
        .agg(dsum(col("y") * cos(col("theta"))).as("c"),
          dsum(col("y") * sin(col("theta"))).as("s"))
        .select(col("k"),
          round(col("nn").cast("double") / col("k"), 3).as("period_days"),
          round((col("c") * col("c") + col("s") * col("s"))
            / col("nn"), 6).as("power"))
        .orderBy(col("k"))
    },
    Some(s"""WITH daily0 AS (
      |  SELECT CAST(ts AS DATE) AS day, ${sqlDsum("value")} AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |mind AS (
      |  SELECT MIN(day) AS d0, CAST(COUNT(*) AS BIGINT) AS nn
      |  FROM daily0),
      |daily AS (
      |  SELECT CAST(datediff('day', m.d0, t.day) AS BIGINT) AS t, t.y, m.nn
      |  FROM daily0 t CROSS JOIN mind m),
      |ks AS (SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT) AS k),
      |proj AS (
      |  SELECT d.k, d.nn,
      |    ${sqlDsum("d.y * cos(d.theta)")} AS c,
      |    ${sqlDsum("d.y * sin(d.theta)")} AS s
      |  FROM (SELECT dd.t, dd.y, dd.nn, kk.k,
      |          2.0 * pi() * kk.k * dd.t / CAST(dd.nn AS DOUBLE) AS theta
      |        FROM daily dd CROSS JOIN ks kk) d
      |  GROUP BY d.k, d.nn)
      |SELECT k, round(CAST(nn AS DOUBLE) / k, 3) AS period_days,
      |  round((c * c + s * s) / nn, 6) AS power
      |FROM proj ORDER BY k""".stripMargin))

  /** q393: Granger causality, one lag (Granger 1969) — does the view
    * stream LEAD the purchase stream? Restricted (y_t ~ y_{t−1}) vs
    * unrestricted (y_t ~ y_{t−1} + x_{t−1}) OLS on the
    * calendar-bounded daily frame, both fits in closed form from ONE
    * exact-moment aggregate (the q343 Cramer machinery), F = ΔRSS /
    * (RSS_u/(n−3)). Lags are window leads — no self-join. */
  val q393 = GQuery(
    "q393_granger_causality",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(dsum(when(col("event_type") === "purchase", col("value")))
          .as("y"),
          coalesce(sum(when(col("event_type") === "view", 1L)), lit(0L))
            .cast("double").as("x"))
        .withColumn("y", coalesce(col("y"), lit(0.0)))
      val lagged = daily
        .withColumn("yl", lag(col("y"), 1).over(W.orderBy(col("day"))))
        .withColumn("xl", lag(col("x"), 1).over(W.orderBy(col("day"))))
        .filter(col("yl").isNotNull)
        .select(col("y"), col("yl"), col("xl"))
      val m = lagged.agg(lcount(lit(1)).as("n"),
        dsum(col("y")).as("sy"), dsum(col("yl")).as("s1"),
        dsum(col("xl")).as("s2"), dsum(col("y") * col("y")).as("syy"),
        dsum(col("yl") * col("yl")).as("s11"),
        dsum(col("xl") * col("xl")).as("s22"),
        dsum(col("yl") * col("xl")).as("s12"),
        dsum(col("y") * col("yl")).as("sy1"),
        dsum(col("y") * col("xl")).as("sy2"))
      // centered moments -> restricted slope + unrestricted Cramer pair
      m.withColumn("c11", col("s11") - col("s1") * col("s1") / col("n"))
        .withColumn("c22", col("s22") - col("s2") * col("s2") / col("n"))
        .withColumn("c12", col("s12") - col("s1") * col("s2") / col("n"))
        .withColumn("cy1", col("sy1") - col("sy") * col("s1") / col("n"))
        .withColumn("cy2", col("sy2") - col("sy") * col("s2") / col("n"))
        .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("n"))
        .withColumn("br", col("cy1") / col("c11"))
        .withColumn("rss_r", col("cyy") - col("br") * col("cy1"))
        .withColumn("det", col("c11") * col("c22") - col("c12") * col("c12"))
        .withColumn("b1",
          (col("cy1") * col("c22") - col("cy2") * col("c12")) / col("det"))
        .withColumn("b2",
          (col("cy2") * col("c11") - col("cy1") * col("c12")) / col("det"))
        .withColumn("rss_u", col("cyy") - col("b1") * col("cy1")
          - col("b2") * col("cy2"))
        .select(col("n"),
          round(col("b2"), 6).as("beta_x_lag"),
          round(col("rss_r"), 6).as("rss_restricted"),
          round(col("rss_u"), 6).as("rss_unrestricted"),
          round((col("rss_r") - col("rss_u"))
            / (col("rss_u") / (col("n") - 3)), 6).as("f_stat"))
    },
    Some(s"""WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    COALESCE(${sqlDsum(
           "CASE WHEN event_type = 'purchase' THEN value END")}, 0.0) AS y,
      |    CAST(COALESCE(CAST(SUM(CASE WHEN event_type = 'view' THEN 1 END)
      |      AS BIGINT), 0) AS DOUBLE) AS x
      |  FROM events GROUP BY 1),
      |lagged AS (
      |  SELECT y, yl, xl FROM (
      |    SELECT y, LAG(y) OVER (ORDER BY day) AS yl,
      |      LAG(x) OVER (ORDER BY day) AS xl
      |    FROM daily) WHERE yl IS NOT NULL),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, ${sqlDsum("y")} AS sy,
      |    ${sqlDsum("yl")} AS s1, ${sqlDsum("xl")} AS s2,
      |    ${sqlDsum("y * y")} AS syy, ${sqlDsum("yl * yl")} AS s11,
      |    ${sqlDsum("xl * xl")} AS s22, ${sqlDsum("yl * xl")} AS s12,
      |    ${sqlDsum("y * yl")} AS sy1, ${sqlDsum("y * xl")} AS sy2
      |  FROM lagged),
      |c AS (
      |  SELECT n, s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
      |    s12 - s1 * s2 / n AS c12, sy1 - sy * s1 / n AS cy1,
      |    sy2 - sy * s2 / n AS cy2, syy - sy * sy / n AS cyy
      |  FROM m),
      |f AS (
      |  SELECT *, cy1 / c11 AS br,
      |    c11 * c22 - c12 * c12 AS det
      |  FROM c),
      |g AS (
      |  SELECT *, cyy - br * cy1 AS rss_r,
      |    (cy1 * c22 - cy2 * c12) / det AS b1,
      |    (cy2 * c11 - cy1 * c12) / det AS b2
      |  FROM f),
      |h AS (
      |  SELECT *, cyy - b1 * cy1 - b2 * cy2 AS rss_u FROM g)
      |SELECT n, round(b2, 6) AS beta_x_lag,
      |  round(rss_r, 6) AS rss_restricted,
      |  round(rss_u, 6) AS rss_unrestricted,
      |  round((rss_r - rss_u) / (rss_u / (n - 3)), 6) AS f_stat
      |FROM h""".stripMargin))

  /** q398: Viterbi best-path decode over the journey chain (Viterbi
    * 1967) — the DECODING member of the Markov family (q388 sums ALL
    * paths into an absorption probability; Viterbi finds the single
    * most likely one): per transient state, the max-product best path
    * to purchase within 4 hops, with the path itself tracked as a
    * string and ties broken on (prob desc, path asc). Four unrolled
    * argmax steps over the states²-bounded landed matrix — the
    * classic DP, each level one join + one row_number. */
  val q398 = GQuery(
    "q398_viterbi_path",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tr = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(lcount(lit(1)).as("n"))
      val fromTot = tr.groupBy(col("from_type")).agg(sum(col("n")).as("nf"))
      val pmat = tr.join(broadcast(fromTot), Seq("from_type"))
        .filter(col("from_type") =!= "purchase")
        .select(col("from_type"), col("to_type"),
          (col("n").cast("double") / col("nf")).as("p"))
        .localCheckpoint(eager = false)
      // V_1: the direct hop
      val v1 = pmat.filter(col("to_type") === "purchase")
        .select(col("from_type").as("st"), col("p").as("v"),
          concat(col("from_type"), lit(">purchase")).as("path"))
      val v4 = (2 to 4).foldLeft(v1) { (vPrev, _) =>
        val ext = pmat.filter(col("to_type") =!= "purchase")
          .join(vPrev.select(col("st").as("to_type"), col("v"), col("path")),
            Seq("to_type"))
          .select(col("from_type").as("st"), (col("p") * col("v")).as("v"),
            concat(col("from_type"), lit(">"), col("path")).as("path"))
        val cand = v1.unionByName(ext)
        cand.withColumn("rn", row_number().over(
            W.partitionBy(col("st")).orderBy(col("v").desc, col("path").asc)))
          .filter(col("rn") === 1).drop("rn")
      }
      v4.select(col("st"), round(col("v"), 6).as("best_prob"), col("path"))
        .orderBy(col("st"))
    },
    Some {
      def step(prev: String, out: String) =
        s"""e$out AS (
      |  SELECT p.from_type AS st, p.p * v.v AS v,
      |    p.from_type || '>' || v.path AS path
      |  FROM pm p JOIN $prev v ON p.to_type = v.st
      |  WHERE p.to_type <> 'purchase'),
      |$out AS (
      |  SELECT st, v, path FROM (
      |    SELECT *, row_number() OVER (PARTITION BY st
      |      ORDER BY v DESC, path ASC) AS rn
      |    FROM (SELECT st, v, path FROM v1
      |          UNION ALL SELECT st, v, path FROM e$out))
      |  WHERE rn = 1)"""
      s"""WITH trr AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |cnt AS (
      |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM trr WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS nf FROM cnt GROUP BY 1),
      |pm AS (
      |  SELECT c.from_type, c.to_type, CAST(c.n AS DOUBLE) / t.nf AS p
      |  FROM cnt c JOIN tot t ON c.from_type = t.from_type
      |  WHERE c.from_type <> 'purchase'),
      |v1 AS (
      |  SELECT from_type AS st, p AS v, from_type || '>purchase' AS path
      |  FROM pm WHERE to_type = 'purchase'),
      |${step("v1", "v2")},
      |${step("v2", "v3")},
      |${step("v3", "v4")}
      |SELECT st, round(v, 6) AS best_prob, path
      |FROM v4 ORDER BY st""".stripMargin
    })

  /** q404: cohort LTV projection — the business face of the q317
    * retention matrix: per signup cohort, retention decays roughly
    * geometrically, so ln(retention) regresses on week offset (exact
    * moments, the q25 fit shape, weeks ≥ 1 only — week 0 is 100% by
    * construction), and the projected 52-week lifetime value is
    * ARPU·Σ_{t=0}^{51} r̂ᵗ = ARPU·(1−r̂⁵²)/(1−r̂) with the power
    * computed by exp(52·ln r̂) (spelled identically — pow is not
    * correctly rounded everywhere). Cohorts and offsets are
    * calendar-bounded; the fact scan happens once. */
  val q404 = GQuery(
    "q404_ltv_projection",
    (s, d) => {
      val ev = events(s, d)
      val firstWk = ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("first_day"))
        .select(col("user_id"),
          Dates.floorWeekSunday(col("first_day")).as("cohort"))
      val active = ev.select(col("user_id"), to_date(col("ts")).as("day"),
          when(col("event_type") === "purchase", col("value")) .as("spend"))
        .join(firstWk, Seq("user_id"))
        .withColumn("wk", (datediff(col("day"), col("cohort")) / 7)
          .cast("long"))
      val cohortSize = firstWk.groupBy(col("cohort"))
        .agg(lcount(lit(1)).as("n0"))
      val byWeek = active.groupBy(col("cohort"), col("wk"))
        .agg(countDistinct(col("user_id")).cast("long").as("n_active"),
          coalesce(dsum(col("spend")), lit(0.0)).as("rev"))
      val fit = byWeek.join(broadcast(cohortSize), Seq("cohort"))
        .filter(col("wk") >= 1)
        .withColumn("lr", log(col("n_active").cast("double") / col("n0")))
        .groupBy(col("cohort"), col("n0"))
        .agg(lcount(lit(1)).as("nw"),
          dsum(col("wk").cast("double")).as("sx"),
          dsum(col("wk").cast("double") * col("wk")).as("sxx"),
          dsum(col("lr")).as("sy"),
          dsum(col("wk").cast("double") * col("lr")).as("sxy"))
        // late cohorts with <3 observed weeks cannot support a decay
        // fit (nw=1 zeroes the OLS denominator) — excluded, not nulled
        .filter(col("nw") >= 3)
        .withColumn("slope",
          (col("nw") * col("sxy") - col("sx") * col("sy"))
            / (col("nw") * col("sxx") - col("sx") * col("sx")))
        .withColumn("r", exp(col("slope")))
      val rev = byWeek.groupBy(col("cohort"))
        .agg(dsum(col("rev")).as("rev_total"), sum(col("n_active")).as("aw"))
      fit.join(rev, Seq("cohort"))
        .withColumn("arpu", col("rev_total") / col("aw"))
        .select(col("cohort"), col("n0"), col("nw"),
          round(col("r"), 6).as("weekly_retention"),
          round(col("arpu"), 6).as("arpu_active_week"),
          round(when(col("r") < 1,
            col("arpu") * (lit(1.0) - exp(lit(52.0) * log(col("r"))))
              / (lit(1.0) - col("r"))), 6).as("ltv_52wk"))
        .orderBy(col("cohort"))
    },
    Some(s"""WITH fw AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      |  FROM events GROUP BY user_id),
      |coh AS (
      |  SELECT user_id,
      |    first_day - CAST(dayofweek(first_day) AS INT) AS cohort
      |  FROM fw),
      |active AS (
      |  SELECT e.user_id, c.cohort,
      |    CAST(datediff('day', c.cohort, CAST(e.ts AS DATE)) AS BIGINT)
      |      // 7 AS wk,
      |    CASE WHEN e.event_type = 'purchase' THEN e.value END AS spend
      |  FROM events e JOIN coh c ON e.user_id = c.user_id),
      |cs AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n0
      |  FROM coh GROUP BY cohort),
      |bw AS (
      |  SELECT cohort, wk,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
      |    COALESCE(${sqlDsum("spend")}, 0.0) AS rev
      |  FROM active GROUP BY cohort, wk),
      |fit AS (
      |  SELECT b.cohort, c.n0, CAST(COUNT(*) AS BIGINT) AS nw,
      |    ${sqlDsum("CAST(b.wk AS DOUBLE)")} AS sx,
      |    ${sqlDsum("CAST(b.wk AS DOUBLE) * b.wk")} AS sxx,
      |    ${sqlDsum("ln(CAST(b.n_active AS DOUBLE) / c.n0)")} AS sy,
      |    ${sqlDsum(
           "CAST(b.wk AS DOUBLE) * ln(CAST(b.n_active AS DOUBLE) / c.n0)")}
      |      AS sxy
      |  FROM bw b JOIN cs c ON b.cohort = c.cohort
      |  WHERE b.wk >= 1 GROUP BY b.cohort, c.n0),
      |fr AS (
      |  SELECT cohort, n0, nw,
      |    exp((nw * sxy - sx * sy) / (nw * sxx - sx * sx)) AS r
      |  FROM fit WHERE nw >= 3),
      |rev AS (
      |  SELECT cohort, ${sqlDsum("rev")} AS rev_total,
      |    CAST(SUM(n_active) AS BIGINT) AS aw
      |  FROM bw GROUP BY cohort)
      |SELECT f.cohort, f.n0, f.nw,
      |  round(f.r, 6) AS weekly_retention,
      |  round(v.rev_total / v.aw, 6) AS arpu_active_week,
      |  round(CASE WHEN f.r < 1
      |    THEN (v.rev_total / v.aw) * (1.0 - exp(52.0 * ln(f.r)))
      |      / (1.0 - f.r) END, 6) AS ltv_52wk
      |FROM fr f JOIN rev v ON f.cohort = v.cohort
      |ORDER BY f.cohort""".stripMargin))

  /** q406: Haar wavelet energy decomposition, 3 levels (Haar 1910; the
    * multi-resolution complement of q392's periodogram — WHERE in time
    * the variance lives, not just at which frequency): the e2-scaled
    * daily series halves via t div 2 grouping per level — averages
    * carry down, differences are the detail coefficients — and the
    * census reports per-level coefficient count and energy. Integer
    * e2 arithmetic would drift through odd-length halvings, so levels
    * use exact decimal sums with one division per node; the calendar
    * bounds every frame. */
  val q406 = GQuery(
    "q406_haar_energy",
    (s, d) => {
      val daily0 = events(s, d).filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(dsum(col("value")).as("y"))
      val mind = daily0.agg(min(col("day")).as("d0"))
      val level0 = daily0.crossJoin(broadcast(mind))
        .select(datediff(col("day"), col("d0")).cast("long").as("t"),
          col("y"))
      def halve(lv: org.apache.spark.sql.DataFrame) = lv
        .groupBy(expr("t div 2").as("t"))
        .agg(count(lit(1)).as("m"),
          (dsum(when(col("t") % 2 === 0, col("y"))) .as("ye")),
          (dsum(when(col("t") % 2 === 1, col("y"))) .as("yo")))
      def detail(h: org.apache.spark.sql.DataFrame, level: Int) = h
        .filter(col("m") === 2)
        .select(lit(level.toLong).as("level"),
          ((col("ye") - col("yo")) / 2).as("dcoef"))
        .groupBy(col("level"))
        .agg(lcount(lit(1)).as("n_coefs"),
          round(dsum(col("dcoef") * col("dcoef")), 6).as("energy"))
      def approx(h: org.apache.spark.sql.DataFrame) = h.filter(col("m") === 2)
        .select(col("t"), ((col("ye") + col("yo")) / 2).as("y"))
      val h1 = halve(level0)
      val a1 = approx(h1)
      val h2 = halve(a1)
      val a2 = approx(h2)
      val h3 = halve(a2)
      detail(h1, 1).unionByName(detail(h2, 2)).unionByName(detail(h3, 3))
        .orderBy(col("level"))
    },
    Some {
      def halveSql(prev: String, h: String) =
        s"""$h AS (
      |  SELECT t // 2 AS t, CAST(COUNT(*) AS BIGINT) AS m,
      |    ${sqlDsum("CASE WHEN t % 2 = 0 THEN y END")} AS ye,
      |    ${sqlDsum("CASE WHEN t % 2 = 1 THEN y END")} AS yo
      |  FROM $prev GROUP BY t // 2)"""
      s"""WITH daily0 AS (
      |  SELECT CAST(ts AS DATE) AS day, ${sqlDsum("value")} AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |mind AS (SELECT MIN(day) AS d0 FROM daily0),
      |l0 AS (
      |  SELECT CAST(datediff('day', m.d0, t.day) AS BIGINT) AS t, t.y
      |  FROM daily0 t CROSS JOIN mind m),
      |${halveSql("l0", "h1")},
      |a1 AS (SELECT t, (ye + yo) / 2 AS y FROM h1 WHERE m = 2),
      |${halveSql("a1", "h2")},
      |a2 AS (SELECT t, (ye + yo) / 2 AS y FROM h2 WHERE m = 2),
      |${halveSql("a2", "h3")},
      |dd AS (
      |  SELECT CAST(1 AS BIGINT) AS level, (ye - yo) / 2 AS dc
      |  FROM h1 WHERE m = 2
      |  UNION ALL SELECT 2, (ye - yo) / 2 FROM h2 WHERE m = 2
      |  UNION ALL SELECT 3, (ye - yo) / 2 FROM h3 WHERE m = 2)
      |SELECT level, CAST(COUNT(*) AS BIGINT) AS n_coefs,
      |  round(${sqlDsum("dc * dc")}, 6) AS energy
      |FROM dd GROUP BY level ORDER BY level""".stripMargin
    })

  def queries: Seq[GQuery] =
    Seq(q43, q44, q56, q70, q181, q182, q183, q196, q197, q263, q272, q278,
      q279, q280, q281, q285, q301, q302, q303, q309, q310, q317, q318,
      q320, q322, q323, q326, q329, q354, q363, q373, q374, q388, q392,
      q393, q398, q404, q406)
}
