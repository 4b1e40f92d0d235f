package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.UniqueKeyFullJoin

/** The merge-trips entry point (SURVEY §3.2,
  * `/root/reference/R/merge-trips.R:17-65`): landings and validated GPS
  * trips are matched full-outer on (landing_date, imei), restricted to
  * the rows unique per key on each side; ambiguous rows pass through
  * unmatched. The PDS side's landing_date is the trip end's date.
  *
  * One plan: two windowed uniqueness counts (sharing the join's
  * exchange) + one full-outer sort-merge join + two unionByName.
  */
object MergeTrips {

  /** landings: (landing_id, landing_date: date, imei, …) ;
    * pdsTrips: (tracker_trip_id, ended: timestamp, imei, …). */
  def apply(landings: DataFrame, pdsTrips: DataFrame): DataFrame = {
    val l = landings.withColumn("imei", col("imei").cast("string"))
    val r = pdsTrips
      .withColumn("landing_date", to_date(col("ended")))
      .withColumn("imei", col("imei").cast("string"))
    UniqueKeyFullJoin(l, r, Seq("landing_date", "imei"))
  }

  /** The catch composition inside merge_trips
    * (`R/merge-trips.R:104-116`): rows with individuals > 0 pass
    * through; for "no catch" rows (catch_taxon "0") exactly ONE row per
    * landing is kept. The reference's `sample_n(1)` is a random draw —
    * replicated as the md5-minimal row over (landing_id, rowKey), the
    * pipeline's ST8 deterministic-draw policy (same distribution-free
    * purpose, replayable by any engine). */
  def composeCatch(tripsUnnested: DataFrame, rowKey: String): DataFrame = {
    val cols = tripsUnnested.columns.toSeq
    val catches = tripsUnnested.filter(col("individuals") > 0)
    val noCatch = tripsUnnested.filter(col("catch_taxon") === "0")
      .groupBy(col("landing_id"))
      .agg(min_by(struct(cols.map(col): _*),
        md5(concat_ws(" ", col("landing_id"), col(rowKey)))).as("__r"))
      .select(col("__r.*"))
    catches.unionByName(noCatch)
  }

  /** 1-minute track downsample (`R/merge-trips.R:135-151`): floor the
    * point time to the minute; per (trip, minute) keep firsts in time
    * order (min_by on the raw timestamp, value tie-break — R's `first`
    * is frame order) and the mean speed. One shuffle, map-side
    * combined; the kernel q16 gates. Expects (trip, time, lat, lng,
    * speed) plus optional carried columns in `firsts`. */
  def downsampleTracks(tracks: DataFrame, firsts: Seq[String] = Seq("lat", "lng")): DataFrame = {
    def f(c: String) = min_by(col(c), struct(col("time"), col(c))).as(c)
    tracks
      .groupBy(col("trip"), date_trunc("minute", col("time")).as("time_min"))
      .agg(f(firsts.head), (firsts.tail.map(f) :+
        graft.core.Exact.davg(col("speed")).as("speed")): _*)
  }

  /** Tinytest gate 3 (`inst/tinytest/test_merged_trips.R`): both ids
    * must stay unique after the merge. Returns (is_ok, duplicated ids
    * count) as a tiny frame for the pipeline's quality gate. */
  def gate(merged: DataFrame): Boolean = {
    def unique(c: String): Boolean =
      merged.filter(col(c).isNotNull)
        .groupBy(col(c)).count().filter(col("count") > 1).isEmpty
    unique("landing_id") && unique("tracker_trip_id")
  }
}
