package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.functions.Dates

/** The format-public-data entry point (SURVEY §3.3,
  * `/root/reference/R/format-public-data.R:27-284`): anonymized trip
  * ids, the trips/catch projections, and the recorded-activity rollups
  * at the four reporting grains.
  */
object PublicData {

  /** md5 anonymized trip id over (landing_id, tracker_trip_id) — the
    * reference hashes R's `paste` output, where a missing id prints as
    * the literal "NA"; replicated exactly for parity
    * (`R/format-public-data.R:312-319`). */
  def withTripId(merged: DataFrame): DataFrame =
    merged.withColumn("trip_id",
      md5(concat_ws(" ",
        coalesce(col("landing_id").cast("string"), lit("NA")),
        coalesce(col("tracker_trip_id").cast("string"), lit("NA")))))

  /** One recorded-activity rollup per grain: day / Sunday-week / month /
    * year (`R/format-public-data.R:363-457`). `grain` ∈
    * {"day","week","month","year"}. */
  def summariseTrips(trips: DataFrame, grain: String, dateCol: String = "landing_date"): DataFrame = {
    val bin = grain match {
      case "week" => Dates.floorWeekSunday(col(dateCol))
      case g      => to_date(date_trunc(g, col(dateCol)))
    }
    trips
      .groupBy(bin.as("period_start"))
      .agg(
        countDistinct(col("trip_id")).as("n_trips"),
        lcount(col("landing_id")).as("n_landings"),
        lcount(col("tracker_trip_id")).as("n_tracks"),
        dsum(col("weight_kg")).as("catch_kg"),
        dsum(col("total_catch_value")).as("catch_value"))
  }

  /** All four grains stacked with a grain tag — the reference writes
    * one artifact per grain; a single stacked frame partition-prunes the
    * same way and shares one scan. */
  def allGrains(trips: DataFrame): DataFrame =
    Seq("day", "week", "month", "year").map { g =>
      summariseTrips(trips, g).withColumn("grain", lit(g))
    }.reduce(_.unionByName(_))

  /** Tinytest gate 4: anonymized trip_id unique. */
  def gate(publicTrips: DataFrame): Boolean =
    publicTrips.groupBy(col("trip_id")).count().filter(col("count") > 1).isEmpty
}
