package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.functions.PointInRing
import graft.plans.PointInRingBBox

/** The bbox rule must turn an opaque point_in_ring filter into parquet
  * PushedFilters without changing the selected row set. */
class PointInRingBBoxSpec extends SparkSpec {

  private def ring(vs: (Double, Double)*) =
    array(vs.flatMap { case (x, y) => Seq(lit(x), lit(y)) }: _*)

  private lazy val installed: Unit = {
    PointInRing.register(spark)
    spark.experimental.extraOptimizations ++= Seq(PointInRingBBox)
  }

  test("bounding-box conjuncts reach the parquet scan") {
    installed
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(call_function("point_in_ring",
        col("l_quantity"), col("l_extendedprice"),
        ring((10.0, 1000.0), (20.0, 1000.0), (20.0, 5000.0), (10.0, 5000.0))))
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metadata.getOrElse("PushedFilters", "")
    }
    val pushed = scans.mkString(";")
    assert(pushed.contains("GreaterThanOrEqual(l_quantity,10.0)"), pushed)
    assert(pushed.contains("LessThanOrEqual(l_extendedprice,5000.0)"), pushed)
  }

  test("row set identical with and without the rule") {
    installed
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
    val r = ring((5.0, 900.0), (30.0, 900.0), (30.0, 20000.0), (5.0, 20000.0))
    val withRule = raw.filter(call_function("point_in_ring",
      col("l_quantity"), col("l_extendedprice"), r)).count()
    // reference: evaluate the predicate as a projection (no Filter node,
    // so the rule never fires) and count true rows
    val reference = raw.select(call_function("point_in_ring",
      col("l_quantity"), col("l_extendedprice"), r).as("p"))
      .collect().count(row => !row.isNullAt(0) && row.getBoolean(0))
    assert(withRule == reference && withRule > 0,
      s"withRule=$withRule reference=$reference")
  }
}
