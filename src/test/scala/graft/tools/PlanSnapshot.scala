package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression harness: one line per registered query with
  * the multiset of physical operator labels (node ids stripped) from
  * the formatted explain at sf0.001. The committed snapshot
  * (`PLAN_SNAPSHOT.txt`) makes UNINTENDED plan drift — a lost
  * broadcast, a new shuffle, a window sneaking back in — show up as a
  * one-line diff at round end, complementing the targeted PlanSpec
  * gates which only pin properties someone thought to assert.
  *
  * Usage (test scope — building every query executes the bounded
  * driver-side training collects, so this is a tool, not an sbt test):
  *   Test/runMain graft.tools.PlanSnapshot write   # regenerate
  *   Test/runMain graft.tools.PlanSnapshot check   # diff, exit 1 on drift
  */
object PlanSnapshot {

  private val SnapshotPath = "PLAN_SNAPSHOT.txt"
  private val Sf = "/root/testdata/sf0.001"

  private def nodeLabel(line: String): Option[String] = {
    val t = line.dropWhile(c => c == ' ' || c == ':' || c == '+' || c == '-')
    if (t.isEmpty || !line.contains("- ")) None
    else Some(t.replaceAll("\\s*\\(\\d+\\)\\s*$", "").trim)
      .filter(_.nonEmpty)
  }

  private def shape(spark: SparkSession, name: String): String = {
    val df = graft.queries.Registry.byName(name).run(spark, Sf)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    val counts = tree.flatMap(nodeLabel)
      .groupBy(identity).map { case (k, v) => (k, v.size) }
      .toSeq.sortBy(_._1)
    s"$name: " + counts.map { case (k, n) => s"$k=$n" }.mkString(" | ")
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("check")
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master("local[4]")
          .appName("plansnap").config("spark.ui.enabled", "false"),
        parallelism = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.queries.Registry.all.map(_.name).sorted
    val lines = names.map { n =>
      try shape(spark, n)
      catch { case e: Exception => s"$n: BUILD-ERROR ${e.getClass.getSimpleName}" }
    }
    mode match {
      case "write" =>
        Files.write(Paths.get(SnapshotPath),
          (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
        println(s"wrote ${lines.length} plan shapes to $SnapshotPath")
      case _ =>
        val want = new String(Files.readAllBytes(Paths.get(SnapshotPath)),
          StandardCharsets.UTF_8).linesIterator.toSeq
        val wantMap = want.map(l => l.takeWhile(_ != ':') -> l).toMap
        var drift = 0
        lines.foreach { l =>
          val q = l.takeWhile(_ != ':')
          wantMap.get(q) match {
            case Some(w) if w == l => ()
            case Some(w) =>
              drift += 1
              println(s"DRIFT $q\n  was: ${w.drop(q.length + 2)}\n  now: ${l.drop(q.length + 2)}")
            case None =>
              println(s"NEW $q (run 'write' to adopt)")
          }
        }
        want.map(_.takeWhile(_ != ':'))
          .filterNot(names.contains).foreach(q => println(s"REMOVED $q"))
        println(s"checked ${lines.length} queries, $drift drifted")
        if (drift > 0) sys.exit(1)
    }
    spark.stop()
  }
}
