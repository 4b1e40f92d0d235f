package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming level-shift monitor — the streaming arm of q279's offline
  * CUSUM ([[graft.operators.ChangePoint]]), in the [[StreamKll]]
  * "bounded per-key state + algebraic merge" shape: the stream
  * maintains one EXACT running total per calendar day (a streaming
  * groupBy in Update mode — decimal-routed sums, so the per-day state
  * is bit-identical to a batch rollup no matter how the rows arrive in
  * micro-batches), and the monitor step runs the offline CUSUM over
  * the latest per-day emissions. State is CALENDAR-bounded (one row
  * per day, not per event), so the unbounded stream never grows the
  * state store; the argmax recompute each tick is over that bounded
  * frame — the same economics as [[Downsample]].
  *
  * Batch ≡ stream: day totals are exact decimal sums (associative, so
  * micro-batch boundaries are invisible) and the CUSUM step is shared
  * code — StreamChangePointSpec pins the full equality against the
  * q279 batch path.
  */
object StreamChangePoint {

  /** Streaming per-day exact totals in e6-floored int64 units (the
    * q279 scaling): Update-mode emission of the changed days each
    * micro-batch. Callers keep the LATEST row per day (memory sink in
    * tests; a keyed upsert sink in production). */
  def dailyTotals(df: DataFrame, tsCol: String, valueCol: String): DataFrame =
    df.select(to_date(col(tsCol)).as("day"), col(valueCol).as("v"))
      .groupBy(col("day"))
      .agg(floor(sum(col("v").cast("decimal(38,6)")).cast("double") * 1e6 +
        lit(0.5)).cast("long").as("t_e6"))

  /** Monitor step: offline CUSUM over the latest per-day rows. */
  def changePoint(latestDaily: DataFrame): DataFrame =
    graft.operators.ChangePoint.cusum(latestDaily, "day", "t_e6")
}
