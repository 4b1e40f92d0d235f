package graft.core

import org.apache.spark.sql.SparkSession
import graft.functions.GraftExtensions

/** One-call session setup for users switching from the reference
  * pipeline: native functions + optimizer rules installed, and the
  * engine's recommended runtime configuration applied.
  *
  * The conf choices and why they hold from local[32] to a 1000-executor
  * cluster:
  *   - AQE on with partition coalescing and skew-join splitting: plans
  *     re-partition themselves from runtime statistics, which is the
  *     main defence against the reference data's skew (hot landing
  *     sites, hot devices) without hand-tuned salting everywhere.
  *   - broadcast threshold 64 MB: every dimension table in the model
  *     (region/nation/customer-sized, device registries, morphometric
  *     tables) broadcasts, keeping the fact-side scan shuffle-free.
  *   - shuffle partitions default to the cluster's parallelism (caller
  *     passes it; AQE coalesces down when small) rather than a magic
  *     200.
  *   - UTC session timezone: the reference stores UTC and parses
  *     tz-suffixed timestamps (`R/ingest-pds-data.R` UTC handling);
  *     engine results must not depend on driver-local time.
  */
object GraftSession {

  /** Apply engine defaults to a builder; caller still picks master and
    * app name. `parallelism` sizes the shuffle — pass the cluster's
    * total cores (or executors × cores). */
  def configure(builder: SparkSession.Builder, parallelism: Int): SparkSession.Builder =
    builder
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)

  /** Local session (tests, single-node runs). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]")
      .appName("graft"), parallelism = cores)
      .getOrCreate()
}
