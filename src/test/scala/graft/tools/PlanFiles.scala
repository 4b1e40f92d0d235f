package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump FULL `.explain("formatted")` output of named queries to
  * `plans/r11/<name>_<suffix>.txt` — the optimization round's
  * before/after plan evidence. Usage:
  *   runMain graft.tools.PlanFiles <suffix> <q1,q2,...>
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val (suffix, names) = (args(0), args(1).split(",").toSeq)
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master("local[4]")
          .appName("planfiles").config("spark.ui.enabled", "false"),
        parallelism = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r11"))
    names.foreach { n =>
      val df = graft.queries.Registry.byName(n).run(spark, "/root/testdata/sf0.01")
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"plans/r11/${n}_$suffix.txt"), p)
      println(s"[planfiles] wrote plans/r11/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
