package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the streaming face of the dedup suite
  * (SURVEY §2.10 + the training-data mandate): the reference's batch
  * process-once anti-join (`/root/reference/R/preprocess-landings.R:267-271`)
  * becomes, on an unbounded source, exactly-once-per-key emission with
  * bounded state.
  *
  * Two state regimes:
  *   - [[exactOnce]]: `dropDuplicates(keys)` on a stream keeps EVERY key
  *     in the state store forever — correct, but state grows with key
  *     cardinality; right for finite key universes (device registries).
  *   - [[withinWatermark]]: `dropDuplicatesWithinWatermark` keeps only
  *     keys newer than the event-time watermark — constant state under a
  *     steady ingest rate; right for at-least-once sources (Kafka,
  *     Kinesis, retried REST pages) where duplicates arrive close
  *     together. This is the 100 TB-scale default.
  *
  * Both run identically over batch frames (plain dropDuplicates
  * semantics), keeping the batch ≡ stream contract of this module.
  */
object StreamDedup {

  /** Keep the first row per key, holding all seen keys in state. */
  def exactOnce(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Keep the first row per key among rows whose event time is above
    * the watermark; state for a key is dropped once the watermark
    * passes it. `tsCol` must be the watermarked event-time column when
    * `df` is streaming. */
  def withinWatermark(df: DataFrame, keys: Seq[String], tsCol: String,
                      delay: String): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
    else df.dropDuplicates(keys)

  /** Batch-mode reference semantics for tests: first row per key in
    * (tsCol, tiebreak) order — what a correctly deduped stream replays
    * to when every duplicate arrives within the watermark. */
  def batchFirstPerKey(df: DataFrame, keys: Seq[String], tsCol: String,
                       tiebreak: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy((col(tsCol) +: tiebreak.map(col)).map(_.asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
