package graft

import org.apache.spark.sql.functions._
import graft.functions.MeanDigitRuns
import graft.operators.WideNest

/** The native codegen expression must agree with the composed
  * regexp_extract_all+aggregate form on every input shape. */
class MeanDigitRunsSpec extends SparkSpec {
  import spark.implicits._

  test("native == composed on fixtures, including no-digit and multibyte") {
    MeanDigitRuns.register(spark)
    val rows = Seq(
      "no_individuals_10_15", "a1b2c3", "007", "x", "",
      "tail9", "9head", "10", "no_individuals_0_5",
      "ünïcode_12_æ_34", "番号42と7", "a_100000000000_2").toDF("name")
      .repartition(3)
    val out = rows.select(
      call_function("mean_digit_runs", col("name")).as("native"),
      WideNest.meanOfNumbersInName(col("name")).as("composed")).collect()
    out.foreach { r =>
      val n = if (r.isNullAt(0)) null else r.getDouble(0)
      val c = if (r.isNullAt(1)) null else r.getDouble(1)
      assert(n == c, s"native=$n composed=$c")
    }
  }

  test("stays inside whole-stage codegen") {
    MeanDigitRuns.register(spark)
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(call_function("mean_digit_runs",
        concat(lit("q_"), col("l_quantity").cast("int").cast("string"))).as("m"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val codegenProject = df.queryExecution.executedPlan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString.contains("mean_digit_runs")
      case _ => false
    }
    assert(codegenProject, df.queryExecution.executedPlan.toString)
    assert(df.count() > 0)
  }
}
