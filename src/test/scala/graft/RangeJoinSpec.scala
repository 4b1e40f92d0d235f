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
}
