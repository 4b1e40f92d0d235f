package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Scratch: job/stage timing of one registered query at sf0.1. */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    // SPARK_PROF_CONF="k1=v1,k2=v2" ad-hoc conf overrides for experiments
    // apply ad-hoc overrides AFTER configure() so experiments can
    // override the engine defaults (configure sets e.g. adaptive.enabled)
    var b = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .appName("profq").config("spark.ui.enabled", "false"),
      parallelism = 32)
    sys.env.get("SPARK_PROF_CONF").foreach(_.split(",").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b = b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = mutable.Map[Int, Long]()
    val lines = mutable.ArrayBuffer[String]()
    @volatile var t00 = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = System.nanoTime()
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (s, e) = (starts(j.jobId), System.nanoTime())
        if (t00 == 0L) t00 = s
        lines += f"job ${j.jobId}%3d [${(s - t00) / 1e9}%6.2f → ${(e - t00) / 1e9}%6.2f] ${(e - s) / 1e9}%6.2fs"
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val cpu = i.taskMetrics.executorRunTime / 1e3
        val ops = i.rddInfos.map(r => r.scope.map(_.name).getOrElse(r.name))
          .distinct.mkString(">")
        lines += f"  stage ${i.stageId}%3d tasks=${i.numTasks}%3d taskTime=$cpu%7.2fs ${ops.take(140)}"
      }
    })
    val q = graft.queries.Registry.byName(name)
    q.run(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    lines.clear(); t00 = 0L
    val t0 = System.nanoTime()
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    val df = q.run(spark, "/root/testdata/sf0.1")
    df.write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    println("--- planning phases (ms): " +
      df.queryExecution.tracker.phases.map { case (k, v) =>
        s"$k=${v.endTimeMs - v.startTimeMs}" }.mkString(" "))
    println("--- top optimizer rules by time:")
    println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
      .linesIterator.take(18).mkString("\n"))
    Thread.sleep(500)
    lines.foreach(println)
    println(f"TOTAL $total%.2f s")
    val plan = df.queryExecution.executedPlan.toString
    println("FileScans=" + "FileScan".r.findAllIn(plan).length +
      " ReusedExchange=" + "ReusedExchange".r.findAllIn(plan).length +
      " ReusedStage=" + "ReusedQueryStage".r.findAllIn(plan).length +
      " Window=" + "Window".r.findAllIn(plan).length)
    println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("FileScan")
      || l.contains("Window") || l.contains("Join") || l.contains("Aggregate")).take(40)
      .map(_.take(150)).mkString("\n"))
    spark.stop()
  }
}
