package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA level monitor — the incremental arm of the q303
  * control chart, in the [[StreamKll]] bounded-per-key-state shape:
  * each key owns a RING of its last ≤ 40 observed points (the same
  * 40-lag truncation as the batch smoother, so stream ≡ batch is an
  * EXACT integer contract, not a tolerance), and every arriving point
  * emits its smoothed level ewma_e6 = Σ 2^(39−k)·y₍ₜ₋ₖ₎ div Σ 2^(39−k)
  * over the ring (BigInt numerators — 2³⁹ · y_e6 exceeds int64 at
  * real magnitudes; the truncating ÷ matches the batch DECIMAL div on
  * the same nonnegative terms).
  *
  * Ordering contract: points are processed in ascending `dayIdx`
  * within each micro-batch, and a point at or before the key's last
  * seen index is DROPPED (late/duplicate arrivals never rewrite a
  * smoothed level that downstream consumers already acted on — the
  * [[StreamChangePoint]] latest-row discipline, enforced here because
  * the ring is order-sensitive where day totals are not). State per
  * key is 40 pairs of longs regardless of stream length.
  */
object StreamEwma {

  /** Ring lag window — must match the q303 batch pair-join bound. */
  val Lags = 40

  case class PointIn(grp: String, dayIdx: Long, yE6: Long)
  case class Ring(days: Seq[Long], ys: Seq[Long])
  case class LevelOut(grp: String, day_idx: Long, y_e6: Long,
                      ewma_e6: Long, n_lags: Int)

  /** The exact smoothed level over a ring ordered oldest→newest. */
  def level(ys: Seq[Long]): Long = {
    var num = BigInt(0)
    var den = BigInt(0)
    val n = ys.size
    var k = 0
    while (k < n) { // k = lags back from the newest
      val w = BigInt(1) << (Lags - 1 - k)
      num += w * BigInt(ys(n - 1 - k))
      den += w
      k += 1
    }
    (num / den).toLong
  }

  /** Update-mode smoothed levels per key: `df` carries one row per
    * (grp, dayIdx) point — e.g. [[StreamChangePoint.dailyTotals]]
    * emissions keyed by series — and every accepted point emits one
    * [[LevelOut]] row. */
  def levels(df: DataFrame, grpCol: String, dayIdxCol: String,
             valueE6Col: String): Dataset[LevelOut] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(grpCol).cast("string").as("grp"),
        col(dayIdxCol).cast("long").as("dayIdx"),
        col(valueE6Col).cast("long").as("yE6"))
      .as[PointIn]
      .groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[PointIn], state: GroupState[Ring]) =>
          var ring = state.getOption.getOrElse(Ring(Vector.empty, Vector.empty))
          val out = Vector.newBuilder[LevelOut]
          rows.toSeq.sortBy(_.dayIdx).foreach { p =>
            val fresh = ring.days.isEmpty || p.dayIdx > ring.days.last
            if (fresh) {
              ring = Ring((ring.days :+ p.dayIdx).takeRight(Lags),
                (ring.ys :+ p.yE6).takeRight(Lags))
              out += LevelOut(grp, p.dayIdx, p.yE6, level(ring.ys),
                ring.ys.size)
            }
          }
          state.update(ring)
          out.result().iterator
      }
  }
}
