package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming face of the engine's
  * time-proximity matching ([[graft.operators.RangeJoin]] /
  * [[graft.operators.AsOfJoin]] in batch): an unbounded stream of
  * events enriched with recent rows of a second unbounded stream.
  *
  * Structured Streaming requires (1) watermarks on both sides and (2) a
  * time-interval condition bounding how far apart matching rows can be
  * — together they bound the join state: each side buffers only rows
  * younger than watermark + interval, so state is O(rate × window), not
  * O(stream). This is the 100 TB-scale join shape; an unbounded-state
  * stream join is rejected by the planner by design.
  */
object StreamJoin {

  /** Left rows paired with right rows of the same key whose event time
    * lies in [left.ts − lookbackSeconds, left.ts] — "enrich each event
    * with everything the key did in the preceding window". Works on
    * batch frames identically (the condition is an ordinary range
    * predicate there).
    *
    * Column names of the two sides must be disjoint apart from the key
    * (rename upstream); `leftTs`/`rightTs` name each side's event-time
    * column. Inner join: unmatched left rows drop (use the batch
    * operators for left-outer semantics). */
  def recentWindowJoin(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       lookbackSeconds: Long,
                       watermark: String = "1 minute"): DataFrame = {
    // shared non-key names would make the interval predicate ambiguous
    // (or, under lenient self-join resolution, silently tautological)
    val shared = left.columns.toSet.intersect(right.columns.toSet) - key
    require(shared.isEmpty,
      s"stream join sides share non-key columns: ${shared.mkString(", ")} — rename upstream")
    val (l, r) =
      if (left.isStreaming || right.isStreaming)
        (left.withWatermark(leftTs, watermark),
          right.withWatermark(rightTs, watermark))
      else (left, right)
    l.join(r,
      l(key) === r(key) &&
        col(rightTs) >= col(leftTs) - expr(s"interval $lookbackSeconds seconds") &&
        col(rightTs) <= col(leftTs))
      .drop(r(key))
  }

  /** Streaming as-of: each left event paired with the LATEST right row
    * of its key within the lookback — [[recentWindowJoin]] reduced by a
    * max-of-struct aggregation (chained stateful operators: the join's
    * watermark bounds its state, the aggregation closes a left event
    * once the watermark passes it). `max(struct(rightTs, payload…))`
    * stands in for max_by, which streaming aggregations do not allow;
    * struct ordering is lexicographic, so the first field (event time)
    * decides. `leftCols` must uniquely identify a left event. */
  def asOfWithin(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String,
                 rightPayload: Seq[String], lookbackSeconds: Long,
                 watermark: String = "1 minute"): DataFrame = {
    val joined = recentWindowJoin(left, right, key, leftTs, rightTs,
      lookbackSeconds, watermark)
    val leftCols = left.columns.toSeq
    joined
      .groupBy(leftCols.map(col): _*)
      .agg(max(struct((rightTs +: rightPayload).map(col): _*)).as("__best"))
      .select(leftCols.map(col) :+ col("__best.*"): _*)
  }
}
