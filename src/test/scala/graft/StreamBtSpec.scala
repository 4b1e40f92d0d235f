package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stats.BradleyTerry
import graft.streaming.StreamBt

case class CmpEvt(a: String, b: String, wins_a: Long, wins_b: Long)

/** Streaming preference-strength maintenance: storage-resident
  * strength state, warm-start chain across micro-batches bit-equal to
  * the batch replay of the landed log, replay idempotency, and
  * warm-start admission of unseen items. */
@org.scalatest.tags.Slow
class StreamBtSpec extends SparkSpec {
  import spark.implicits._

  private def roots(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("streambt").toString
    (s"$base/pairs", s"$base/strengths")
  }

  private val b1 = Seq(CmpEvt("m1", "m2", 7L, 3L), CmpEvt("m2", "m3", 6L, 4L))
  // batch 2 repeats a pair (accumulation must re-aggregate) and
  // introduces an unseen item m4
  private val b2 = Seq(CmpEvt("m1", "m2", 1L, 4L), CmpEvt("m3", "m4", 2L, 8L))

  private def collectStrengths(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("item") ->
      (r.getAs[Double]("wins"), r.getAs[Double]("games"),
        r.getAs[Double]("strength"))).toMap

  test("strengths chain warm-start across micro-batches == batch replay") {
    val (pr, sr) = roots()
    implicit val sql = spark.sqlContext
    val input = MemoryStream[CmpEvt]
    val q = input.toDF().writeStream
      .foreachBatch(StreamBt.strengthMaintenance(pr, sr, warmRounds = 2))
      .outputMode("append").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val (latest, got0) = StreamBt.latestStrengths(spark, sr).get
    assert(latest == 1L)
    val got = collectStrengths(got0)
    // batch replay of the same chain on the landed log: 2 uniform
    // rounds on b1's pairs, then 2 warm rounds over the re-aggregated
    // union — must be BIT-identical
    def agg(evts: Seq[CmpEvt]) = evts.toDF()
      .groupBy($"a", $"b")
      .agg(org.apache.spark.sql.functions.sum($"wins_a").as("wins_a"),
        org.apache.spark.sql.functions.sum($"wins_b").as("wins_b"))
    val s0 = BradleyTerry.fit(agg(b1), "a", "b", "wins_a", "wins_b", 2)
    val want = collectStrengths(BradleyTerry.continueFrom(
      agg(b1 ++ b2), "a", "b", "wins_a", "wins_b", s0, 2))
    assert(got == want)
    assert(got.keySet == Set("m1", "m2", "m3", "m4"))
    // the unseen item m4 entered and won most of its games: strongest
    assert(got("m4")._3 == got.values.map(_._3).max)
    // strengths normalize to 1 up to the engine's decimal-routed sum
    // (Exact.dsum carries DECIMAL(38,6), so the normalizer is the
    // 6-decimal rounding of Σpraw — a ~1e-6 quantization by design)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 2e-6)
  }

  test("a replayed batchId is a no-op: committed strengths stand") {
    val (pr, sr) = roots()
    val handler = StreamBt.strengthMaintenance(pr, sr, warmRounds = 1)
    handler(b1.toDF(), 0L)
    val before = StreamBt.latestStrengths(spark, sr).get._2.collect().toSet
    // replay with DIFFERENT content — committed state must win
    handler(b2.toDF(), 0L)
    val after = StreamBt.latestStrengths(spark, sr).get._2.collect().toSet
    assert(before == after)
  }

  test("warm-start from converged strengths is a near-fixpoint") {
    // converge hard on one log, then warm-start one more round on the
    // SAME log: the MM update at its fixpoint moves nothing
    val pairs = agg2(b1)
    val s0 = BradleyTerry.fit(pairs, "a", "b", "wins_a", "wins_b", 60)
    val s1 = BradleyTerry.continueFrom(pairs, "a", "b", "wins_a", "wins_b",
      s0, 1)
    val m0 = collectStrengths(s0)
    val m1 = collectStrengths(s1)
    m0.keys.foreach { k =>
      assert(math.abs(m0(k)._3 - m1(k)._3) < 1e-9, s"item $k moved")
    }
  }

  private def agg2(evts: Seq[CmpEvt]) = {
    import org.apache.spark.sql.functions.sum
    evts.toDF().groupBy($"a", $"b")
      .agg(sum($"wins_a").as("wins_a"), sum($"wins_b").as("wins_b"))
  }
}
