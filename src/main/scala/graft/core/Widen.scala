package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for CPU-dense pipelines.
  *
  * Spark sizes file splits by BYTES (`spark.sql.files.maxPartitionBytes`),
  * so a compact input — one small parquet file — plans as ONE task, and
  * every CPU-dense stage fused onto that scan (tokenize/shingle, wide
  * validator projections, explodes) inherits the single task. [[widen]]
  * repartitions such inputs to the default parallelism; inputs that
  * already arrive in enough splits (any production-scale table) pass
  * through untouched, so this is a no-op exactly where the cluster is
  * already busy.
  */
object Widen {
  def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, p / 2)) df.repartition(p) else df
  }
}
