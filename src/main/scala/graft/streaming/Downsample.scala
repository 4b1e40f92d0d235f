package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming-ready transforms (SURVEY §2.10). The reference is batch
  * (cron every 2 days) but its incremental patterns map to Structured
  * Streaming: the 1 Hz GPS → 1-minute downsample
  * (`/root/reference/R/merge-trips.R:135-151`) is a tumbling-window
  * aggregation that runs identically over a batch frame or a
  * `readStream` source with a watermark.
  */
object Downsample {

  /** 1-minute tumbling-window downsample per key: count, exact mean,
    * min/max. Works on batch and streaming frames alike (time-window
    * groupBy; append mode needs the watermark supplied by the caller).
    *
    * min_by/first are not available in streaming aggregations, so the
    * "representative row" is the min/max pair — deterministic in both
    * modes. */
  def perMinute(df: DataFrame, keyCol: String, tsCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol), window(col(tsCol), "1 minute").as("win"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col(valueCol).cast("decimal(38,6)")).cast("double") / count(col(valueCol)))
          .as("mean_value"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
      .select(col(keyCol), col("win.start").as("minute"),
        col("n"), col("mean_value"), col("min_value"), col("max_value"))

  /** Streaming entry: file-source → watermark → perMinute. The caller
    * starts the query (memory sink in tests, parquet sink + checkpoint
    * in production). */
  def streamPerMinute(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, watermark: String = "2 minutes"): DataFrame =
    perMinute(df.withWatermark(tsCol, watermark), keyCol, tsCol, valueCol)
}
