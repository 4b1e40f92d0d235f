package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: time named queries for N passes at a
  * given sf dir (local tooling beside [[Bench]], which owns the
  * driver-contract snapshot). Usage:
  *   runMain graft.Prof <sfDir> <passes> <q1,q2,...>
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val (sfDir, passes, names) = (args(0), args(1).toInt, args(2).split(",").toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.ui.enabled", "false"),
        parallelism = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = graft.queries.Registry.byName
    names.foreach { n =>
      val q = byName(n)
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $n: min ${times.min}%.3f  passes ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
