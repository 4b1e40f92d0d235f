package graft

import org.apache.spark.sql.functions._
import graft.functions.PointInRing
import graft.queries.MiscQueries

class PointInRingSpec extends SparkSpec {
  import spark.implicits._

  private def ringCol(vs: Seq[(Double, Double)]) =
    array(vs.flatMap { case (x, y) => Seq(lit(x), lit(y)) }: _*)

  test("q49/q63 rings are convex and counter-clockwise (oracle precondition)") {
    val rings = ("q49" -> MiscQueries.q49Ring) +: MiscQueries.q63Zones
    rings.foreach { case (name, vs) =>
      vs.indices.foreach { i =>
        val (xi, yi) = vs(i)
        val (xj, yj) = vs((i + 1) % vs.length)
        val (xk, yk) = vs((i + 2) % vs.length)
        val cross = (xj - xi) * (yk - yi) - (yj - yi) * (xk - xi)
        assert(cross > 0, s"$name: turn at vertex $i is not a left turn: $cross")
      }
    }
  }

  test("interior, exterior and hole composition") {
    PointInRing.register(spark)
    val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val hole = Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0))
    val pts = Seq(
      (5.0, 1.0, true),   // inside outer, outside hole
      (5.0, 5.0, false),  // inside the hole
      (11.0, 5.0, false), // outside
      (-1.0, -1.0, false),
      (9.9, 9.9, true))
      .toDF("x", "y", "want")
    val got = pts.withColumn("in",
      call_function("point_in_ring", $"x", $"y", ringCol(square)) &&
        !call_function("point_in_ring", $"x", $"y", ringCol(hole))).collect()
    got.foreach(r => assert(r.getBoolean(3) == r.getBoolean(2), r.toString))
  }

  test("concave ring handled by even-odd rule") {
    PointInRing.register(spark)
    // arrow shape: notch at the right side
    val arrow = Seq((0.0, 0.0), (10.0, 0.0), (5.0, 5.0), (10.0, 10.0), (0.0, 10.0))
    val pts = Seq(
      (2.0, 5.0, true),  // in the body
      (8.0, 5.0, false), // inside the notch
      (8.0, 1.0, true))  // below the notch
      .toDF("x", "y", "want")
    val got = pts.withColumn("in",
      call_function("point_in_ring", $"x", $"y", ringCol(arrow))).collect()
    got.foreach(r => assert(r.getBoolean(3) == r.getBoolean(2), r.toString))
  }

  test("projection stays in whole-stage codegen over parquet input") {
    PointInRing.register(spark)
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(call_function("point_in_ring",
        col("l_quantity"), col("l_extendedprice"),
        ringCol(Seq((0.0, 0.0), (100.0, 0.0), (100.0, 1e6), (0.0, 1e6)))).as("in"))
    val codegen = df.queryExecution.executedPlan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString.contains("point_in_ring")
      case _ => false
    }
    assert(codegen, df.queryExecution.executedPlan.toString)
    assert(df.filter($"in").count() > 0)
  }
  test("malformed rings yield null, not a garbage classification") {
    PointInRing.register(spark)
    val out = Seq((5.0, 5.0)).toDF("x", "y")
      .select(
        call_function("point_in_ring", $"x", $"y",
          array(lit(0.0), lit(0.0), lit(null).cast("double"), lit(10.0),
            lit(10.0), lit(10.0))).as("null_vertex"),
        call_function("point_in_ring", $"x", $"y",
          array(lit(0.0), lit(0.0), lit(10.0))).as("odd_len"),
        call_function("point_in_ring", $"x", $"y",
          array(lit(0.0), lit(0.0), lit(10.0), lit(0.0))).as("two_vertices"))
      .head()
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2))
  }
}
