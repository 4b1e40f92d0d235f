package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamEwma
import graft.streaming.StreamEwma.{LevelOut, PointIn}

/** Streaming truncated-EWMA levels: stream ≡ batch replay exactly
  * across micro-batch boundaries, the per-key ring caps at 40 lags,
  * late/duplicate points drop, and the smoothed level matches the
  * q303 batch weighting (hand BigInt fold) bit-for-bit. */
class StreamEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def expected(ys: Seq[Long]): Long =
    StreamEwma.level(ys.takeRight(StreamEwma.Lags))

  private def run(name: String, batches: Seq[Seq[PointIn]]): Seq[LevelOut] = {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[PointIn]
    val q = StreamEwma.levels(in.toDF(), "grp", "dayIdx", "yE6")
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[LevelOut].collect().toSeq.sortBy(r => (r.grp, r.day_idx))
  }

  test("stream over three micro-batches equals one-batch replay, per key") {
    val a = (1L to 12L).map(i => PointIn("a", i, i * 1000000L + (i % 3)))
    val b = (1L to 7L).map(i => PointIn("b", i, 5000000L - i * 7L))
    val all = (a ++ b)
    val split = run("sewma1", Seq(all.take(6), all.slice(6, 13), all.drop(13)))
    val whole = run("sewma2", Seq(all))
    assert(split == whole)
    // and every level matches the hand fold of its own prefix
    for (r <- split) {
      val series = (if (r.grp == "a") a else b)
        .filter(_.dayIdx <= r.day_idx).map(_.yE6)
      assert(r.ewma_e6 == expected(series), s"at ${r.grp}/${r.day_idx}")
    }
  }

  test("ring caps at 40 lags: day 41+ levels use only the last 40 points") {
    val pts = (1L to 50L).map(i => PointIn("a", i, if (i <= 10) 9999999L else 1000L))
    val got = run("sewma3", Seq(pts))
    assert(got.map(_.n_lags).max == StreamEwma.Lags)
    val last = got.last
    assert(last.n_lags == StreamEwma.Lags)
    // the early spike has fully left the window by day 50
    assert(last.ewma_e6 == expected((11L to 50L).map(_ => 1000L)))
    assert(last.ewma_e6 == 1000L)
  }

  test("late and duplicate points drop; fresh points still advance") {
    val got = run("sewma4", Seq(
      Seq(PointIn("a", 1, 100L), PointIn("a", 2, 200L)),
      Seq(PointIn("a", 2, 999L), PointIn("a", 1, 999L), // dup + late: dropped
        PointIn("a", 3, 300L))))
    assert(got.map(_.day_idx) == Seq(1L, 2L, 3L))
    assert(got.map(_.y_e6) == Seq(100L, 200L, 300L))
    assert(got.last.ewma_e6 == expected(Seq(100L, 200L, 300L)))
  }

  test("newest point dominates: weights halve per lag back") {
    // two points: weights 2^39 (new) and 2^38 (old) => (2*new + old)/3
    val got = run("sewma5", Seq(Seq(PointIn("a", 1, 300L), PointIn("a", 2, 600L))))
    assert(got.last.ewma_e6 == (2L * 600L + 300L) / 3L)
  }
}
