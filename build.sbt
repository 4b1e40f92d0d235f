ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "peskastimordatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The full suite (851 tests) exceeds the CI gate's budget (41 min on a
// loaded box); the ~17 slowest suites — iterative graph/index algorithms
// whose cost is many tiny Spark jobs, not assertions — carry
// @org.scalatest.tags.Slow and are excluded from the default `sbt test`
// gate (~9 min). Run EVERYTHING with `GRAFT_SLOW_TESTS=1 sbt test`
// (done once per round; the result is recorded in OPTIMIZATION_r*.md).
Test / testOptions ++= (
  if (sys.env.contains("GRAFT_SLOW_TESTS")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "org.scalatest.tags.Slow"))
)
// Pass the forked JVM's stdout straight through instead of routing it
// via the sbt logger — the logger's "[info] " prefix corrupts the
// one-line JSON contract that Bench/Verify print for the driver
// (every prior round's BENCH_r*.json shows "parsed": null).
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32g default: the exact-percentile aggregates and per-query caches
  // are comfortably sized for it, and a tight heap (8g) showed multi-
  // second GC pauses in full 48-query bench runs on this 128 GiB box
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // pre-size the heap: without -Xms the JVM grows 512m -> tens of GB
  // across a 400-query suite, paying expansion-triggered GC cycles
  // inside timed windows (guide §5); 16g covers the suite's steady
  // live set with room, on a 128 GiB box
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM_MIN", "16g")}",
  // whole-stage codegen emits fresh classes per query; a 50-query
  // suite overflows the default 240m code cache, silently disabling
  // the JIT mid-run (queries late in the run went 3-4x slower)
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
