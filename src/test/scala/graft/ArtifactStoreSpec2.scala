package graft

import graft.core.ArtifactStore
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned artifact write prunes directories on read filters") {
    val root = java.nio.file.Files.createTempDirectory("graft-part").toString
    val store = new ArtifactStore(spark, root)
    val df = Seq(
      ("2024-01", "A", 1.0), ("2024-01", "B", 2.0),
      ("2024-02", "A", 3.0), ("2024-03", "C", 4.0))
      .toDF("month", "site", "v")
    store.writePartitioned(df, "landings", "20240301_abc1234", Seq("month"))

    val rd = store.read("landings").filter(col("month") === "2024-01")
    // the month predicate must become a PartitionFilter, not a data filter
    val scans = rd.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val pf = scans.head.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("month"), s"no partition filter: $pf")
    // and only the matching partition's rows are read
    assert(rd.count() == 2)
    assert(rd.agg(sum($"v")).head().getDouble(0) == 3.0)
  }
}
