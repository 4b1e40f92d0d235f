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
      val validated = ValidateLandings.full(
        ValidateQueries.fixtureTrips(s, d), ValidateQueries.fixtureCatch(s, d),
        ValidateQueries.fixtureRegistry(s, d), ValidateQueries.fixtureVesselDim(s),
        ValidateQueries.fixtureGearDim(s), ValidateQueries.fixtureStations(s, d),
        ValidateQueries.fixtureReportingUnits(s, d),
        ValidateQueries.fixtureHabitatDim(s), ValidateQueries.fixtureConservationDim(s))
        .select(col("submission_id"), col("landing_date"),
          col("imei_resolved"), col("catch_price"))
        .localCheckpoint(false)
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

  def queries: Seq[GQuery] = Seq(q95)
}
