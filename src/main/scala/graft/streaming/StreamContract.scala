package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Expectations.RowRule

/** Streaming data-contract gate — [[graft.core.Expectations]]'s row
  * rules applied per micro-batch as an ingest firewall: rows that
  * satisfy every rule land in the main table, violating rows land in a
  * quarantine table tagged with WHICH rules failed, and a one-row
  * per-batch audit record lands beside them. The reference's pipeline
  * runs its gates AFTER ingest and re-runs the stage when they fire;
  * a streaming corpus wants the gate ON the ingest path so bad
  * records never enter downstream state (dedup stores, indexes).
  *
  * All three sinks follow the [[IdempotentSink]] batch=<id> protocol,
  * so a crash-replayed micro-batch overwrites its own directories and
  * the gate stays exactly-once. Rule evaluation is a per-row
  * projection (no shuffle); the audit aggregate is one map-side
  * combined job over the batch.
  */
object StreamContract {

  /** foreachBatch writer: `.writeStream.foreachBatch(StreamContract
    * .gate(rules, root))`. Layout under `root`:
    * `main/batch=<id>`, `quarantine/batch=<id>` (with a
    * `failed_rules` array column), `audit/batch=<id>`
    * (batch_id, rule, n_rows, n_bad). */
  def gate(rules: Seq[RowRule], root: String): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val fs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def committed(sub: String) =
        fs.exists(new Path(s"$root/$sub/batch=$batchId/_SUCCESS"))
      if (!(committed("main") && committed("quarantine") && committed("audit"))) {
        // one pass computes every verdict; the split below reuses it
        val failed = array_compact(array(rules.map(r =>
          when(r.ok.isNull || !r.ok, lit(r.rule))): _*))
        // one batch-sized materialization; both splits and the audit
        // read it, then the blocks are dropped before the next batch
        val tagged = batch.withColumn("failed_rules", failed).persist()
        try {
          tagged.filter(size(col("failed_rules")) === 0).drop("failed_rules")
            .write.mode("overwrite").parquet(s"$root/main/batch=$batchId")
          tagged.filter(size(col("failed_rules")) > 0)
            .write.mode("overwrite").parquet(s"$root/quarantine/batch=$batchId")
          val aggs = count(lit(1)).as("n_rows") +:
            rules.map(r => sum(when(array_contains(col("failed_rules"), r.rule),
              1L).otherwise(0L)).as(s"__v_${r.rule}"))
          tagged.agg(aggs.head, aggs.tail: _*)
            .select(explode(array(rules.map(r => struct(
              lit(r.rule).as("rule"), col("n_rows"),
              col(s"__v_${r.rule}").as("n_bad"))): _*)).as("e"))
            .select(lit(batchId).as("batch_id"), col("e.rule"),
              col("e.n_rows"), col("e.n_bad"))
            .write.mode("overwrite").parquet(s"$root/audit/batch=$batchId")
        } finally tagged.unpersist()
      }
  }
}
