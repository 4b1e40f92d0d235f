package graft

import graft.similarity.{AdcDistance, Pq}
import org.apache.spark.sql.functions._

/** Native adc_distance expression: the per-pair ADC lookup-sum must
  * match the compositional aggregate(zip_with(lut, codes, element_at))
  * spelling exactly — value, null semantics, and codegen parity. */
class AdcDistanceSpec extends SparkSpec {
  import spark.implicits._

  Pq.register(spark)

  private def native = call_function("adc_distance", col("lut"), col("codes"))
  private def legacy = aggregate(
    zip_with(col("lut"), col("codes"), (l, cd) => element_at(l, cd + 1)),
    lit(0L), (acc, x) => acc + x)

  test("value parity with the compositional spelling, incl. empty arrays") {
    val df = Seq(
      (Array(Array(10L, 20L), Array(30L, 40L)), Array(0, 1)),
      (Array(Array(7L, 5L), Array(1L, 2L)), Array(1, 0)),
      (Array.empty[Array[Long]], Array.empty[Int])).toDF("lut", "codes")
    val rows = df.select(native.as("n"), legacy.as("o")).as[(Long, Long)].collect()
    assert(rows.toSeq == Seq((50L, 50L), (6L, 6L), (0L, 0L)))
  }

  test("null inputs null out") {
    val df = Seq(
      (Some(Array(Array(1L, 2L))), None: Option[Array[Int]]),
      (None: Option[Array[Array[Long]]], Some(Array(0)))).toDF("lut", "codes")
    val got = df.select(native.as[java.lang.Long]).collect()
    assert(got.forall(_ == null))
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val lutLit = Literal.create(
      new GenericArrayData(Array[Any](
        new GenericArrayData(Array(10L, 20L)),
        new GenericArrayData(Array(30L, 40L)))),
      ArrayType(ArrayType(LongType, containsNull = false), containsNull = false))
    val codesLit = Literal.create(
      new GenericArrayData(Array(1, 0)),
      ArrayType(IntegerType, containsNull = false))
    assert(AdcDistance(lutLit, codesLit).eval(null) == 50L)
    val df = Seq((Array(Array(10L, 20L), Array(30L, 40L)), Array(1, 0)))
      .toDF("lut", "codes")
    assert(df.select(native).head().getLong(0) == 50L)
  }

  test("Pq.adcCol plans the native expression, no interpreted fold in the scan") {
    // columns derive from range so constant folding can't pre-evaluate
    val df = spark.range(3).select(
      array(array(col("id"), col("id") * 2), array(lit(5L), lit(7L))).as("lut"),
      array(lit(1), lit(0)).as("codes"))
    val sel = df.select(Pq.adcCol(col("lut"), col("codes")).as("adc"))
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("adc_distance"), s"native expression missing:\n$plan")
    assert(!plan.contains("zip_with"), s"lambda path leaked:\n$plan")
    assert(!plan.contains("aggregate("), s"interpreted fold leaked:\n$plan")
    assert(sel.as[Long].collect().sorted.toSeq == Seq(5L, 7L, 9L))
  }
}
