package graft.tmp
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[4]").config("spark.ui.enabled", "false"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (n <- args) {
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
