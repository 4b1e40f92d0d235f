package graft

import java.sql.Timestamp

import graft.operators.Decay
import org.apache.spark.sql.functions._

class DecaySpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: String) = Timestamp.valueOf(s"$day 12:00:00")

  test("hand-computed half-life weights: 1, 1/2, 1/4, and the >50-step cutoff") {
    val rows = Seq(
      ("a", ts("2024-06-29")), // newest → age 0, k=0, w=1
      ("a", ts("2024-06-22")), // 7 days, k=1, w=0.5
      ("a", ts("2024-06-15")), // 14 days, k=2, w=0.25
      ("b", ts("2024-06-27")), // 2 days, k=0, w=1
      ("b", ts("2023-05-01"))  // 425 days, k=60 > 50 → 0
    ).toDF("key", "t")
    val out = Decay.halfLifeScores(rows, $"t", Seq("key"), halfLifeDays = 7)
      .select($"key", $"n_events", $"decayed_score")
      .as[(String, Long, Double)].collect().toMap2
    assert(out("a") == ((3L, 1.75)))
    assert(out("b") == ((2L, 1.0)))
  }

  test("decayed score is partition-order independent (int64 weight sums)") {
    val rows = (1 to 5000).map { i =>
      (s"k${i % 3}", ts(f"2024-${1 + i % 6}%02d-${1 + i % 28}%02d"))
    }
    val a = Decay.halfLifeScores(rows.toDF("key", "t").repartition(17), $"t", Seq("key"), 7)
      .select($"key", $"decayed_score").as[(String, Double)].collect().toMap
    val b = Decay.halfLifeScores(rows.toDF("key", "t").repartition(2), $"t", Seq("key"), 7)
      .select($"key", $"decayed_score").as[(String, Double)].collect().toMap
    assert(a == b)
  }

  test("weight sums survive >8k same-bucket events (the int64-overflow regression)") {
    // 10k events at k=0 sum to 10k·2^50 ≈ 1.1e19 > 2^63 — overflows a
    // long sum; the DECIMAL(38,0) route must stay exact
    val rows = (1 to 10000).map(_ => ("hot", ts("2024-06-29")))
    val out = Decay.halfLifeScores(rows.toDF("key", "t"), $"t", Seq("key"), 7)
      .select($"n_events", $"decayed_score").as[(Long, Double)].head()
    assert(out == ((10000L, 10000.0)))
  }

  test("halfLifeDays validation") {
    intercept[IllegalArgumentException] {
      Decay.halfLifeScores(Seq(("a", ts("2024-01-01"))).toDF("key", "t"),
        $"t", Seq("key"), halfLifeDays = 0)
    }
  }

  private implicit class Pairs(rows: Array[(String, Long, Double)]) {
    def toMap2: Map[String, (Long, Double)] =
      rows.map { case (k, n, s) => k -> ((n, s)) }.toMap
  }
}
