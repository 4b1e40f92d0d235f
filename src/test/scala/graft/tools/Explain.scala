package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper (test source set — not shipped in the artifact).
  * Usage: Test / runMain graft.tools.Explain <sfDir> <query>...
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <query>...")
    val d = args.head
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[4]").config("spark.ui.enabled", "false"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.tail) {
      println(s"===== $n =====")
      val plan = graft.queries.Registry.byName(n).run(spark, d)
        .queryExecution.executedPlan.toString
      // compress: show only operator lines
      plan.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Scan") ||
          l.contains("Aggregate") || l.contains("Window") || l.contains("Sort") && !l.contains("SortAgg"))
        .map(_.take(150)).foreach(println)
    }
    spark.stop()
  }
}
