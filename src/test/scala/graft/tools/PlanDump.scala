package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Scratch: dump formatted plans of named queries at sf0.001. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master("local[4]")
          .appName("plandump").config("spark.ui.enabled", "false"),
        parallelism = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val df = graft.queries.Registry.byName(n).run(spark, "/root/testdata/sf0.001")
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      println(s"########## $n")
      // operator tree only (the header section before the per-node detail)
      println(p.linesIterator.takeWhile(_.trim.nonEmpty).mkString("\n"))
      println("---- joins/windows/expands/scans:")
      println(p.linesIterator.filter(l => l.contains("Join") || l.contains("Window")
        || l.contains("Expand") || l.contains("CartesianProduct")
        || l.contains("ReadSchema") || l.contains("hll_")
        || l.contains("common_prefix_len")).map(_.take(200)).mkString("\n"))
    }
    spark.stop()
  }
}
