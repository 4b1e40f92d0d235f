package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump FULL `.explain("formatted")` output of named queries to
  * `<outDir>/<name>_<suffix>.txt` — the optimization rounds'
  * before/after plan evidence. Usage:
  *   runMain graft.tools.PlanFiles <outDir> <suffix> <q1,q2,...> [sfDir]
  * sfDir defaults to $SPARK_GRAFT_SF_DIR, else /root/testdata/sf0.01.
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val (outDir, suffix, names) = (args(0), args(1), args(2).split(",").toSeq)
    val sfDir =
      if (args.length > 3) args(3)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master("local[4]")
          .appName("planfiles").config("spark.ui.enabled", "false"),
        parallelism = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = graft.queries.Registry.byName(n).run(spark, sfDir)
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), p)
      println(s"[planfiles] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
