package graft

import org.apache.spark.sql.functions._
import graft.operators.SpatialJoin

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private val polys = Seq(
    ("sq", Seq(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0)),
    ("tri", Seq(20.0, 0.0, 30.0, 0.0, 20.0, 10.0))).toDF("zone", "ring")

  test("exact membership: bbox false positives trimmed, boundary cells fine") {
    val pts = Seq(
      (1L, 5.0, 5.0),   // inside square
      (2L, 29.0, 9.0),  // inside triangle's bbox, outside triangle
      (3L, 21.0, 1.0),  // inside triangle
      (4L, 15.0, 5.0),  // between zones
      (5L, 9.9, 9.9)    // inside square, near corner cell
    ).toDF("id", "x", "y")
    val got = SpatialJoin.pointInPolygonJoin(pts, polys, "x", "y", "ring", cellSize = 4.0)
      .select($"id", $"zone").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "sq"), (3L, "tri"), (5L, "sq")))
  }

  test("plans as a broadcast equi-join on grid cells, not a nested loop") {
    val pts = Seq((1L, 5.0, 5.0)).toDF("id", "x", "y")
    val plan = SpatialJoin.pointInPolygonJoin(pts, polys, "x", "y", "ring", 4.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
