package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[8]")
        .appName("planaudit").config("spark.ui.enabled", "false"), 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args(0).split(",")
    names.foreach { n =>
      val df = graft.queries.Registry.byName(n).run(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      def c(p: String) = p.r.findAllIn(plan).length
      println(s"$n cartesian=${c("CartesianProduct")} bnlj=${c("BroadcastNestedLoopJoin")} " +
        s"sortGlobal=${c("Sort \\[.*\\], true")} exchanges=${c("Exchange")} " +
        s"scans=${c("FileScan")} wscg=${c("WholeStageCodegen")}")
    }
    spark.stop()
  }
}
