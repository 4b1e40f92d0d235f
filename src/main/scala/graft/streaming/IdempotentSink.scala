package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.hadoop.fs.Path

/** Exactly-once parquet sink for `foreachBatch` — the streaming face of
  * the reference's process-once contract (its batch pipeline re-runs
  * stages and anti-joins out already-processed rows,
  * `/root/reference/R/preprocess-landings.R:267-271`).
  *
  * Structured Streaming re-executes a micro-batch after a crash with
  * the SAME batchId; `foreachBatch` sinks are therefore exactly-once
  * only if the writer is idempotent per batchId. Each batch lands in
  * its own `batch=<id>` directory; a re-delivered batch finds the
  * committed `_SUCCESS` marker and becomes a no-op. Readers scan the
  * root as one hive-partitioned table.
  */
object IdempotentSink {

  /** Writer for `.writeStream.foreachBatch(IdempotentSink.parquet(root))`. */
  def parquet(root: String): (DataFrame, Long) => Unit = { (df, batchId) =>
    val path = new Path(s"$root/batch=$batchId")
    val fs = path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val committed = fs.exists(new Path(path, "_SUCCESS"))
    if (!committed)
      // overwrite clears any torn partial output from a crashed attempt
      df.write.mode("overwrite").parquet(path.toString)
  }
}
