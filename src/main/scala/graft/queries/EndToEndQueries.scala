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
  * q10, q74-q87); this entry tracks the COMPOSITION's cost
  * round-over-round in the bench (EndToEndSpec pins the composition's
  * semantics on hand-checked frames, so the driver's rows-only check
  * here is backed by a real gate). */
object EndToEndQueries {

  val q95 = GQuery(
    "q95_end_to_end_dag",
    (s, d) => {
      val validated = ValidateLandings.full(
        ValidateQueries.fixtureTrips(s, d), ValidateQueries.fixtureCatch(s, d),
        ValidateQueries.fixtureRegistry(s, d), ValidateQueries.fixtureVesselDim(s),
        ValidateQueries.fixtureGearDim(s), ValidateQueries.fixtureStations(s, d),
        ValidateQueries.fixtureReportingUnits(s, d),
        ValidateQueries.fixtureHabitatDim(s), ValidateQueries.fixtureConservationDim(s))
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
    oracle = None, // composition cost tracker; semantics gated per stage + EndToEndSpec
    headline = true)

  def queries: Seq[GQuery] = Seq(q95)
}
