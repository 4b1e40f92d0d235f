package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Streaming arm of the CDC apply kernel ([[Incremental.applyCdc]]) —
  * the lakehouse landing path as a `foreachBatch` sink: each
  * micro-batch of (key, seq, op, payload…) change events MERGEs into
  * the landed snapshot and commits the result as a new snapshot
  * version. Pairs with the batch kernel the way every other
  * incremental operator here pairs (q88/q133/q142: batch probes a
  * landed index; here the stream maintains the landed table itself).
  *
  * Exactly-once via the [[IdempotentSink]] protocol: snapshot versions
  * are keyed by batchId (`root/v=<batchId>`), so a crash-redelivered
  * micro-batch finds its committed `_SUCCESS` marker and becomes a
  * no-op instead of double-applying its deletes/upserts. Reading the
  * prior snapshot means listing committed versions below the current
  * batchId and taking the highest — a bounded directory listing, the
  * same "latest version wins" discipline as the artifact store (S15).
  *
  * Fold correctness is the batch kernel's own spec'd property
  * (StreamingSpec: applyCdc folded over sub-batches ≡ one-shot apply
  * of the full log, because per-key max-seq is associative); this
  * sink adds the exactly-once commit discipline around it, and
  * StreamCdcSpec drives the composition end-to-end. */
object StreamCdc {

  /** Committed snapshot versions under `root`, ascending. */
  def committedVersions(spark: org.apache.spark.sql.SparkSession,
                        root: String): Seq[Long] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("v=") &&
        fs.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** The latest committed snapshot, or None before the first commit. */
  def latestSnapshot(spark: org.apache.spark.sql.SparkSession,
                     root: String): Option[DataFrame] =
    committedVersions(spark, root).lastOption
      .map(v => spark.read.parquet(s"$root/v=$v"))

  /** Retention: delete all but the newest `keep` committed versions
    * (plus any uncommitted/torn directory older than the newest kept —
    * a crashed attempt's debris). Each snapshot is a full copy, so an
    * unexpired store grows by one corpus per micro-batch; run this
    * from the same maintenance cadence that compacts the lakehouse.
    * Never deletes the newest version, so readers racing the cleaner
    * always find a committed snapshot. */
  def expireVersions(spark: org.apache.spark.sql.SparkSession,
                     root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least the latest version")
    val versions = committedVersions(spark, root)
    val drop = versions.dropRight(keep)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    drop.foreach(v => fs.delete(new Path(s"$root/v=$v"), true))
    drop
  }

  /** Writer for
    * `.writeStream.foreachBatch(StreamCdc.parquetSnapshot(root, "k", "seq", "op"))`.
    * The batch must carry `keyCol`, `seqCol`, `opCol` plus the payload
    * columns; the maintained snapshot holds `keyCol` + payload. */
  def parquetSnapshot(root: String, keyCol: String, seqCol: String,
                      opCol: String): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val target = new Path(s"$root/v=$batchId")
      val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // redelivery (same id) or replay of an older batch: committed → no-op
      if (!fs.exists(new Path(target, "_SUCCESS"))) {
        val prior = committedVersions(spark, root).filter(_ < batchId).lastOption
        val snapshot = prior match {
          case Some(v) => spark.read.parquet(s"$root/v=$v")
          case None => batch.drop(seqCol, opCol).limit(0) // empty, payload schema
        }
        val next = Incremental.applyCdc(snapshot, batch, keyCol, seqCol, opCol)
        // overwrite clears torn partial output from a crashed attempt
        next.write.mode("overwrite").parquet(target.toString)
      }
  }
}
