package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{RewriteRankFilterToTopK, TopKPerKeyStrategy}

/** The heap-based top-k operator must be plan-visible and row-identical
  * to the stock Exchange→Sort→Window→Filter pipeline. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private lazy val installed: Unit = {
    spark.experimental.extraOptimizations ++= Seq(RewriteRankFilterToTopK)
    spark.experimental.extraStrategies ++= Seq(TopKPerKeyStrategy)
  }

  private def ranked(k: Int) = {
    val rnd = new scala.util.Random(7)
    val df = (1 to 2000).map(i => (s"g${rnd.nextInt(20)}", rnd.nextInt(10000), i))
      .toDF("g", "score", "id").repartition(8)
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
    df.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
  }

  test("rewrites to TopKLocalExec + TopKFinalExec, subsuming WindowGroupLimit") {
    installed
    // AQE wraps the plan: assert on the rendered tree, which includes it
    val plan = ranked(5).queryExecution.executedPlan.toString
    assert(plan.contains("TopKFinal"), plan)
    assert(plan.contains("TopKLocal"), plan)
    assert(!plan.contains("WindowExec") && !plan.contains("WindowGroupLimit"), plan)
    // the only Sort left is the final pass over locally-reduced rows —
    // it must sit between the exchange and TopKFinal, not below TopKLocal
    val lines = plan.linesIterator.toSeq
    val localIdx = lines.indexWhere(_.contains("TopKLocal"))
    assert(!lines.drop(localIdx + 1).exists(_.contains("Sort ")),
      s"map side must not sort full partitions:\n$plan")
  }

  test("row-identical to the window pipeline, ranks 1..k") {
    installed
    val got = ranked(3).select($"g", $"rank", $"score", $"id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    // reference computed on the driver from the same deterministic data
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map(i => (s"g${rnd.nextInt(20)}", rnd.nextInt(10000), i))
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex.map {
        case ((_, score, id), i) => (g, i + 1, score, id)
      }
    }.toSet
    assert(got == expected)
  }

  test("groups smaller than k keep all rows; row_number==1 form also rewrites") {
    installed
    val df = Seq(("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val w = Window.partitionBy($"g").orderBy($"v".desc)
    val top = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(top.queryExecution.executedPlan.toString.contains("TopKFinal"))
    val got = top.select($"g", $"v").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == Set(("a", 2), ("b", 9)))
  }

  test("rank used beyond filtering still carries correct values") {
    installed
    val df = Seq(("a", 10), ("a", 20), ("a", 30), ("b", 5)).toDF("g", "v")
    val w = Window.partitionBy($"g").orderBy($"v".desc)
    val out = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 2)
      .withColumn("weighted", $"v" * $"rank").orderBy($"g", $"rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(3))).toSeq
    assert(out == Seq(("a", 30, 30), ("a", 20, 40), ("b", 5, 5)))
  }
}
