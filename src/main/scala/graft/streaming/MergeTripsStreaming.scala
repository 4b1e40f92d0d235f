package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the merge-trips entry point (SURVEY §3.2,
  * `/root/reference/R/merge-trips.R:17-65`): each landing submission is
  * matched, per tracker imei, to the LATEST PDS trip whose end falls
  * within `lookbackSeconds` before the landing's event time.
  *
  * This is the as-of reduction of the batch unique-day full join
  * ([[graft.pipeline.MergeTrips]]): a day's "only trip" is not knowable
  * until the day closes, so recency-within-lookback is the
  * streaming-consistent uniqueness — and on data where the batch rule
  * matches at all (one landing and one preceding trip end per
  * (date, imei)), the two agree row for row (pinned by
  * MergeTripsStreamSpec). Unmatched landings drop (inner as-of); the
  * batch operator remains the of-record day-grain merge.
  */
object MergeTripsStreaming {

  /** landings: (landing_id, landing_ts: timestamp, imei, …);
    * pdsTrips: (tracker_trip_id, ended: timestamp, imei). Works
    * identically on batch frames (the join collapses to a range join,
    * the aggregation to max_by). */
  def merge(landings: DataFrame, pdsTrips: DataFrame,
            lookbackSeconds: Long = 24 * 3600,
            watermark: String = "1 minute"): DataFrame =
    StreamJoin.asOfWithin(
      landings,
      pdsTrips.select(col("tracker_trip_id"), col("ended"),
        col("imei").cast("string").as("imei")),
      key = "imei", leftTs = "landing_ts", rightTs = "ended",
      rightPayload = Seq("tracker_trip_id"),
      lookbackSeconds = lookbackSeconds, watermark = watermark)
}
