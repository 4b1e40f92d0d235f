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
