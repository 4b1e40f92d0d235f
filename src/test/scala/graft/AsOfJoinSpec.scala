package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val right = Seq(
    ("a", 10L, "r10"), ("a", 20L, "r20"), ("a", 30L, "r30"),
    ("b", 5L, "rb5")).toDF("k", "ts", "tag")

  test("backward as-of picks the latest right row at or before each left ts") {
    val left = Seq(
      ("a", 9L), ("a", 10L), ("a", 25L), ("a", 99L),
      ("b", 4L), ("c", 7L)).toDF("k", "ts")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("tag"))
      .select($"k", $"ts", $"tag").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.getString(2))).toMap
    assert(out(("a", 9L)).isEmpty)        // before all right rows
    assert(out(("a", 10L)).contains("r10")) // exact timestamp matches (inclusive)
    assert(out(("a", 25L)).contains("r20"))
    assert(out(("a", 99L)).contains("r30"))
    assert(out(("b", 4L)).isEmpty)
    assert(out(("c", 7L)).isEmpty)        // key with no right rows at all
  }

  test("tolerance nulls matches that are too old") {
    val left = Seq(("a", 21L), ("a", 50L)).toDF("k", "ts")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("tag"),
        tolerance = 5L)
      .select($"k", $"ts", $"tag").collect()
      .map(r => r.getLong(1) -> Option(r.getString(2))).toMap
    assert(out(21L).contains("r20")) // 1 tick behind, within tolerance
    assert(out(50L).isEmpty)         // r30 is 20 ticks behind
  }

  test("one shuffle, no cartesian: plan has a single exchange and no BNL join") {
    val left = Seq(("a", 9L), ("a", 25L)).toDF("k", "ts")
    val plan = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("tag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
  test("payload name collisions are rejected with a clear error") {
    val left = Seq(("a", 9L, "x")).toDF("k", "ts", "tag")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("tag"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
