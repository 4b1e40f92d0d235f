package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._

/** Window-function surface (SURVEY §2.5 W1–W7, §2.6): lead/lag gaps,
  * keep-first dedupe, first-non-null, mode-by-frequency, grouped
  * "random" sample, and the 1-minute GPS downsample (§2.10).
  *
  * All windows partition by a key with bounded cardinality per group, so
  * they scale: one hash exchange per distinct partitioning, no global
  * sorts.
  */
object WindowQueries {

  /** W1/W6: gap-to-next-event per user in seconds (lead over user/time
    * window; the reference's trip-gap validator,
    * `R/validate-pds-trips.R:41-49`). Timestamps are truncated to whole
    * seconds so µs-vs-ns file precision cannot skew parity. */
  val q11 = GQuery(
    "q11_window_lead_gap",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .withColumn("gap_s",
          unix_timestamp(date_trunc("second", col("next_ts"))) -
            unix_timestamp(date_trunc("second", col("ts"))))
        .groupBy(col("user_id"))
        .agg(
          lcount(col("gap_s")).as("n_gaps"),
          max(col("gap_s")).as("max_gap_s"),
          min(col("gap_s")).as("min_gap_s"),
          lsum6(col("gap_s")).as("sum_gap_s"))
    },
    Some(s"""WITH g AS (
      |  SELECT user_id,
      |    CAST(epoch(date_trunc('second', lead(ts) OVER w)) AS BIGINT)
      |      - CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS gap_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, COUNT(gap_s) AS n_gaps, MAX(gap_s) AS max_gap_s,
      |MIN(gap_s) AS min_gap_s, ${sqlLsum6("gap_s")} AS sum_gap_s
      |FROM g GROUP BY user_id""".stripMargin),
    headline = true)

  /** W3: keep-first-row-per-group dedupe (`row_number()==1`,
    * `R/calculate-weights.R:129-131`), rolled up for a stable compare. */
  val q12 = GQuery(
    "q12_dedupe_keep_first",
    (s, d) => {
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("event_type"))
        .agg(
          lcount(lit(1)).as("n_first"),
          lsum6(col("value")).as("sum_first_value"))
    },
    Some(s"""WITH f AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n_first,
      |${sqlLsum6("value")} AS sum_first_value
      |FROM f WHERE rn = 1 GROUP BY event_type""".stripMargin))

  /** W4: first non-null per group with explicit ordering
    * (`dplyr::first(na.omit(x))`, `R/estimate-catch.R:283-289`); nulls
    * simulated by masking 'error' events. */
  val q13 = GQuery(
    "q13_first_nonnull",
    (s, d) => {
      val masked = events(s, d)
        .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      masked
        .withColumn("rn", row_number().over(w))
        .withColumn("first_v", first(col("v"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("first_v"))
    },
    Some("""WITH m AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |  FROM events),
      |nn AS (
      |  SELECT user_id, v,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM m WHERE v IS NOT NULL)
      |SELECT u.user_id, f.v AS first_v
      |FROM (SELECT DISTINCT user_id FROM m) u
      |LEFT JOIN (SELECT user_id, v FROM nn WHERE rn = 1) f USING (user_id)""".stripMargin))

  /** A16: mode-by-frequency (most frequent event_type per user, ties
    * broken lexicographically; the municipality-mode fill,
    * `R/estimate-catch.R:561-573`). */
  val q14 = GQuery(
    "q14_mode_by_group",
    (s, d) => {
      val counts = events(s, d).groupBy("user_id", "event_type").agg(lcount(lit(1)).as("n"))
      val w = Window.partitionBy("user_id").orderBy(col("n").desc, col("event_type").asc)
      counts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("n"))
    },
    Some("""WITH c AS (
      |  SELECT user_id, event_type, COUNT(*) AS n
      |  FROM events GROUP BY user_id, event_type),
      |r AS (
      |  SELECT user_id, event_type, n,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY n DESC, event_type ASC) AS rn
      |  FROM c)
      |SELECT user_id, event_type AS mode_type, n FROM r WHERE rn = 1""".stripMargin))

  /** A17: grouped deterministic "random" sample — 1 row per (user, day)
    * ordered by a content hash (`sample_n(1)` with a fixed seed,
    * `R/merge-trips.R:110-113`; md5 replaces R's RNG so the oracle can
    * reproduce the draw). */
  val q15 = GQuery(
    "q15_grouped_sample",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"), date_trunc("day", col("ts")))
        .orderBy(md5(col("event_id").cast("string")))
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("event_type"))
        .agg(lcount(lit(1)).as("n_sampled"), lsum6(col("value")).as("sum_value"))
    },
    Some(s"""WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
      |                       ORDER BY md5(CAST(event_id AS VARCHAR))) AS rn
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n_sampled,
      |${sqlLsum6("value")} AS sum_value
      |FROM r WHERE rn = 1 GROUP BY event_type""".stripMargin))

  /** §2.10: 1-minute tumbling-window downsample of the event stream
    * (1 Hz GPS → 1-min track export, `R/merge-trips.R:135-151`): per
    * (user, minute) the value of the lowest event_id plus mean/count.
    * Streaming-ready: the same aggregation runs under `readStream` with
    * a watermark (see graft.streaming.Downsample). */
  val q16 = GQuery(
    "q16_window_downsample",
    (s, d) =>
      events(s, d)
        .groupBy(col("user_id"), date_trunc("minute", col("ts")).as("minute"))
        .agg(
          min_by(col("value"), col("event_id")).as("first_value"),
          lavg6(col("value")).as("mean_value"),
          lcount(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(
          lcount(lit(1)).as("n_minutes"),
          lsum6(col("first_value")).as("sum_first"),
          lsum6(col("mean_value")).as("sum_mean"),
          max(col("n")).as("max_per_minute")),
    Some(s"""WITH m AS (
      |  SELECT user_id, date_trunc('minute', ts) AS minute,
      |    arg_min(value, event_id) AS first_value,
      |    ${sqlLavg6("value")} AS mean_value,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id, COUNT(*) AS n_minutes,
      |${sqlLsum6("first_value")} AS sum_first,
      |${sqlLsum6("mean_value")} AS sum_mean,
      |MAX(n) AS max_per_minute
      |FROM m GROUP BY user_id""".stripMargin))

  /** Gap-based sessionization, batch face: the same
    * [[graft.streaming.Sessionize]] kernel that runs under
    * `flatMapGroupsWithState` in streaming, here checked against a
    * windowed SQL derivation (gap flag → cumulative session id).
    * Output stays in exact integer/timestamp arithmetic (counts,
    * second durations) so no float ordering can bite. */
  val q60 = GQuery(
    "q60_sessionize_batch",
    (s, d) => {
      import s.implicits._
      val ev = events(s, d)
        .select(col("user_id"), col("ts"), col("value"))
        .as[graft.streaming.Sessionize.Event]
      graft.streaming.Sessionize.sessions(ev, gapSeconds = 1800, streaming = false)
        .groupBy(col("user_id"))
        .agg(
          lcount(lit(1)).as("n_sessions"),
          sum(col("n_events")).cast("long").as("n_events"),
          max(col("n_events")).as("max_session_events"),
          sum(unix_timestamp(col("session_end")) - unix_timestamp(col("session_start")))
            .cast("long").as("total_session_secs"))
    },
    Some("""WITH e AS (
      |  -- millisecond floor mirrors the engine's Timestamp.getTime basis
      |  SELECT user_id, epoch_ms(ts) AS ms, value FROM events),
      |o AS (
      |  SELECT user_id, ms,
      |    CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, value)
      |              > 1800000
      |         OR lag(ms) OVER (PARTITION BY user_id ORDER BY ms, value) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM e),
      |sess AS (
      |  SELECT user_id, ms,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ms
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM o),
      |agg AS (
      |  SELECT user_id, sid, COUNT(*) AS n_events,
      |    MAX(ms) // 1000 - MIN(ms) // 1000 AS dur
      |  FROM sess GROUP BY user_id, sid)
      |SELECT user_id, COUNT(*) AS n_sessions,
      |CAST(SUM(n_events) AS BIGINT) AS n_events,
      |MAX(n_events) AS max_session_events,
      |CAST(SUM(dur) AS BIGINT) AS total_session_secs
      |FROM agg GROUP BY user_id""".stripMargin))

  /** Ranking-family window (ntile): per-flag price deciles with an
    * explicit unique tiebreak (price, orderkey, linenumber) so bucket
    * assignment is deterministic in both engines, rolled up to one row
    * per decile. The shuffle partitions by flag only — decile bounds
    * never need a global sort. */
  val q68 = GQuery(
    "q68_ntile_deciles",
    (s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      lineitem(s, d)
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy(col("l_returnflag"), col("decile"))
        .agg(
          lcount(lit(1)).as("n"),
          round(lsum6(col("l_extendedprice")), 6).as("sum_price"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    },
    Some(s"""WITH t AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    ntile(10) OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS decile
      |  FROM lineitem)
      |SELECT l_returnflag, CAST(decile AS BIGINT) AS decile, COUNT(*) AS n,
      |round(${sqlLsum6("l_extendedprice")}, 6) AS sum_price,
      |MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
      |FROM t GROUP BY 1, 2""".stripMargin))

  def queries: Seq[GQuery] = Seq(q11, q12, q13, q14, q15, q16, q60, q68)
}
