package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("matches exactly the BETWEEN semantics, including bin edges") {
    val intervals = Seq(
      ("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:30:00")),
      ("a", ts("2024-01-01 14:00:00"), ts("2024-01-01 14:10:00")),
      ("b", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("k", "s", "e")
    val points = Seq(
      ("a", ts("2024-01-01 10:00:00")), // boundary start: inclusive
      ("a", ts("2024-01-01 12:30:00")), // boundary end: inclusive
      ("a", ts("2024-01-01 12:59:00")), // same bin as interval 1, outside it
      ("a", ts("2024-01-01 13:59:59")), // adjacent bin, matches nothing
      ("b", ts("2024-01-01 10:30:00")), // other key
      ("c", ts("2024-01-01 10:30:00"))) // key without intervals
      .toDF("k", "ts")
    val got = RangeJoin.pointInInterval(
        points, intervals, Seq("k"), "ts", "s", "e", binSeconds = 3600L)
      .select($"k", $"ts", $"s").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
      .toSet
    assert(got == Set(
      ("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00")),
      ("a", ts("2024-01-01 12:30:00"), ts("2024-01-01 10:00:00")),
      ("b", ts("2024-01-01 10:30:00"), ts("2024-01-01 10:00:00"))))
  }

  test("plans as an equi-join on (key, bin), not a nested loop") {
    val intervals = Seq(("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("k", "s", "e")
    val points = Seq(("a", ts("2024-01-01 11:00:00"))).toDF("k", "ts")
    val plan = RangeJoin.pointInInterval(
        points, intervals, Seq("k"), "ts", "s", "e", 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
  test("inverted and null intervals are ignored, not errors") {
    val intervals = Seq(
      ("a", ts("2024-01-01 12:00:00"), ts("2024-01-01 10:00:00")), // inverted
      ("a", null.asInstanceOf[java.sql.Timestamp], ts("2024-01-01 10:00:00")),
      ("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("k", "s", "e")
    val points = Seq(("a", ts("2024-01-01 10:30:00"))).toDF("k", "ts")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "s", "e", 3600L)
    assert(got.count() == 1)
  }

  test("intervalOverlap matches brute force exactly (incl. multi-bin spans)") {
    val left = Seq(
      ("a", ts("2024-01-01 00:30:00"), ts("2024-01-03 10:00:00")), // spans 3 day-bins
      ("a", ts("2024-01-05 00:00:00"), ts("2024-01-05 01:00:00")),
      ("b", ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")))
      .toDF("k", "s0", "e0")
    val right = Seq(
      ("a", ts("2024-01-02 00:00:00"), ts("2024-01-04 00:00:00")), // overlaps span in 2 shared bins
      ("a", ts("2024-01-03 10:00:00"), ts("2024-01-03 11:00:00")), // touches at closed endpoint
      ("a", ts("2024-01-06 00:00:00"), ts("2024-01-06 01:00:00")), // no overlap
      ("b", ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00")))
      .toDF("k", "s0", "e0")
    val got = RangeJoin.intervalOverlap(left, right, Seq("k"), "s0", "e0", 86400L)
      .select($"k", $"s0", $"s0_r").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    val brute = left.as("l").join(right.toDF("k", "s1", "e1").as("r"), Seq("k"))
      .filter($"s0" <= $"e1" && $"s1" <= $"e0")
      .select($"k", $"s0", $"s1").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(got == brute, s"got $got\nbrute $brute")
    // the multi-bin pair appears exactly once despite 2 shared bins
    assert(got.size == brute.size)
  }

  test("a runaway interval fails with a diagnostic, not an array-limit blowup") {
    // one bad row with a far-future end would otherwise build a
    // sequence() of ~10^7 bins per copy and kill the job opaquely
    val intervals = Seq(
      ("a", ts("2024-01-01 00:00:00"), ts("2300-01-01 00:00:00"))).toDF("k", "s", "e")
    val points = Seq(("a", ts("2024-01-01 10:30:00"))).toDF("k", "ts")
    val err = intercept[Exception] {
      RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "s", "e", 3600L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).exists(_.contains("widen binSeconds")), msgs(err).mkString("; "))
    // a generous explicit cap admits the same span
    val ok = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "s", "e",
      3600L, maxBinsPerInterval = 3000000L)
    assert(ok.count() == 1)
    val err2 = intercept[Exception] {
      RangeJoin.intervalOverlap(intervals, intervals, Seq("k"), "s", "e", 3600L).count()
    }
    assert(msgs(err2).exists(_.contains("widen binSeconds")), msgs(err2).mkString("; "))
  }
}
