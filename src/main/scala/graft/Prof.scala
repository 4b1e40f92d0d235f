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
        // same block hygiene as Bench.materialize: without it, pinned
        // landed/checkpoint blocks accumulate across passes and the GC
        // tax poisons every later measurement (measured: q370 pass1
        // 226 s in a hygiene-less session vs 4.6 s in Bench)
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val keep = graft.core.Landed.liveRddIds(spark)
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!before.contains(id) && !keep.contains(id))
            rdd.unpersist(blocking = false)
        }
        sec
      }
      graft.core.Landed.evict(spark)
      spark.catalog.clearCache()
      System.gc()
      println(f"PROF $n: min ${times.min}%.3f  passes ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
