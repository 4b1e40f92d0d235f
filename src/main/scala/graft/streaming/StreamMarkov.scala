package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming journey-transition extraction — the streaming arm of the
  * Markov attribution family (q280 transition matrix, q330 removal
  * effects): per-user journeys truncate at the FIRST purchase, so the
  * extractor keeps one tiny state per user (last channel + converted
  * flag) and emits each transition exactly once as it becomes known,
  * across any micro-batch split of the stream. A user's events must
  * arrive in event-time order per key (the CDC convention the other
  * keyed streaming arms use); within a micro-batch the group sorts by
  * (ts, event_id) so a batch boundary is invisible.
  *
  * Terminal `→ null` edges (non-converted journeys ending) only exist
  * when the stream is CLOSED: [[terminalEdges]] derives them from the
  * emitted log (each non-converted user's last transition target), so
  * emitted transitions + terminals ≡ the batch q330 journey counts —
  * StreamMarkovSpec pins the identity, micro-batch boundaries and
  * mid-journey conversions included.
  *
  * State per user: two small strings, O(users) total — the same state
  * class as sessionization, with the conversion flag making each
  * journey's state write-once-final. */
object StreamMarkov {

  case class Ev(user_id: Long, sec: Long, event_id: Long, typ: String)
  case class UserState(last: String, converted: Boolean)
  case class Trans(user_id: Long, seq: Long, src: String, dst: String)

  /** Append-mode stream of journey transitions: (user_id, seq, src,
    * dst), seq strictly increasing per user. `dst = "conv"` closes
    * the user's journey; later events for that user are ignored. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
        col(userCol).cast("long").as("user_id"),
        unix_timestamp(col(tsCol)).as("sec"),
        col(idCol).cast("long").as("event_id"),
        col(typeCol).as("typ"))
      .as[Ev]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[(String, Boolean, Long)]) =>
          var (last, converted, seq) =
            state.getOption.getOrElse((null: String, false, 0L))
          val out = Seq.newBuilder[Trans]
          rows.toSeq.sortBy(e => (e.sec, e.event_id)).foreach { e =>
            if (!converted) {
              val dst = if (e.typ == "purchase") "conv" else e.typ
              val src = if (last == null) "start" else last
              seq += 1
              out += Trans(user, seq, src, dst)
              if (dst == "conv") converted = true else last = dst
            }
          }
          state.update((last, converted, seq))
          out.result().iterator
      }
      .toDF()
  }

  /** Batch view over the collected transition log: the terminal
    * `last → null` edge of every journey that never converted. */
  def terminalEdges(log: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    log.withColumn("rk", row_number().over(
        W.partitionBy(col("user_id")).orderBy(col("seq").desc)))
      .filter(col("rk") === 1 && col("dst") =!= "conv")
      .select(col("dst").as("src"), lit("null").as("dst"))
  }

  /** Transition counts from the collected log + terminals — the frame
    * [[graft.graph.MarkovAttribution]] consumes. */
  def counts(log: DataFrame): DataFrame =
    log.select(col("src"), col("dst"))
      .unionByName(terminalEdges(log))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("long").as("n"))
}
