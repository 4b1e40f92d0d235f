package graft

import org.apache.spark.sql.functions._
import graft.similarity.Knn

/** Native dot_scaled expression: value + null/length semantics must
  * match the composable aggregate(zip_with(...)) spelling exactly. */
class DotScaledSpec extends SparkSpec {
  import spark.implicits._

  private def dotRaw = call_function("dot_scaled", col("a"), col("b"))

  test("value parity with the composable spelling; empty arrays sum to 0") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array.empty[Long], Array.empty[Long]),
      (Array(-2L, 7L), Array(3L, -1L))).toDF("a", "b")
    val legacy = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val rows = df.select(dotRaw.as("n"), legacy.as("o"))
      .as[(Long, Long)].collect()
    assert(rows.toSeq == Seq((32L, 32L), (0L, 0L), (-13L, -13L)))
  }

  test("mismatched lengths and null inputs null out, like zip_with padding") {
    val df = Seq(
      (Some(Array(1L, 2L)), Some(Array(3L))),
      (None, Some(Array(3L))),
      (Some(Array(1L)), None)).toDF("a", "b")
    val legacy = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val got = df.select(dotRaw.as[java.lang.Long], legacy.as[java.lang.Long]).collect()
    assert(got.forall { case (n, o) => n == null && o == null })
  }

  test("interpreted eval agrees with codegen") {
    val df = Seq((Array(5L, -3L), Array(2L, 9L))).toDF("a", "b")
    val expr = graft.functions.DotScaled(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(5L, -3L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2L, 9L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(expr.eval(null) == (5L * 2L + -3L * 9L))
    assert(df.select(dotRaw).head().getLong(0) == -17L)
  }

  test("Knn.dotScaled plans the native expression (no zip_with lambda in the hot path)") {
    // inputs depend on a range column so constant folding can't
    // evaluate the dot at plan time
    val df = spark.range(2).select(
      array(col("id").cast("float"), lit(2.0f)).as("x"),
      array(lit(0.5f), lit(0.25f)).as("y"))
    val sel = df.select(Knn.dotScaled(Knn.scaledVec(col("x")),
      Knn.scaledVec(col("y"))).as("d"))
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("dot_scaled"), s"native expression missing:\n$plan")
    assert(!plan.contains("zip_with"), s"lambda path leaked:\n$plan")
    assert(sel.as[Double].collect().sorted.toSeq == Seq(0.5, 1.0))
  }
}
