package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory lives in graft.queries.*; each entry pairs a
  * Spark plan with a DuckDB-runnable ANSI oracle (where SQL-expressible).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-table join rollup exercises broadcast dims + the fact-side
    * shuffle join — the engine's bread-and-butter plan shape. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q05_multiway_join").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** DuckDB-equivalent ANSI SQL per query (same column names/aliases as
    * the Spark result — the driver compare is name-sensitive). Queries
    * without an entry get the weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
