package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Cdc

/** Streaming chunk-level dedup gate — the unbounded-ingest face of
  * content-defined chunking ([[graft.dedup.Cdc]], q225/q229): each
  * micro-batch chunks itself, probes the LANDED chunk-fingerprint
  * index, and documents whose landed token share exceeds the gate are
  * dropped; the survivors' chunk fingerprints extend the index the
  * next batch probes. Because CDC boundaries survive edits outside a
  * chunk, a re-posted article with a new header keeps colliding on its
  * unchanged body chunks — the near-version case whole-doc hashes miss.
  *
  * Same state discipline as [[StreamNovelty]]: the index is
  * storage-resident partitioned parquet (`batch=<id>`), not state-store
  * memory, so it survives restarts, is readable by batch jobs, and
  * tracks ACCEPTED content only. Exactly-once via the
  * [[IdempotentSink]] contract — the corpus `_SUCCESS` marker (written
  * last) is the commit point, and a crash-redelivered batchId no-ops.
  * Per-batch work is the batch's chunks probing the index on the
  * fingerprint key; the landed corpus is never re-chunked.
  *
  * (Unrelated to [[StreamCdc]], which is CHANGE-data-capture — the
  * snapshot-merge lakehouse path.) */
object StreamChunkDedup {

  /** Landed chunk-fingerprint index across committed batches
    * (empty-schema frame when nothing has landed yet). */
  def landedIndex(spark: SparkSession, indexRoot: String): DataFrame = {
    val path = new Path(indexRoot)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.globStatus(new Path(path, "batch=*")).nonEmpty)
      spark.read.parquet(indexRoot)
    else {
      import spark.implicits._
      Seq.empty[String].toDF("fp")
    }
  }

  /** foreachBatch handler: chunk the batch, drop documents whose
    * landed-chunk token share exceeds `maxLandedShare`, append the
    * survivors to `corpusRoot` and their distinct chunk fingerprints
    * to `indexRoot`. Both writes are per-batchId idempotent. */
  def chunkGate(idCol: String, textCol: String, maxLandedShare: Double,
                indexRoot: String, corpusRoot: String): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val corpusPath = new Path(s"$corpusRoot/batch=$batchId")
      val fs = corpusPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(corpusPath, "_SUCCESS"))) {
        // exclude this batch's OWN index partition — present only on a
        // crash-replay that got past the index write
        val landed0 = landedIndex(spark, indexRoot)
        val landed =
          if (landed0.columns.contains("batch"))
            landed0.filter(col("batch") =!= batchId).drop("batch")
          else landed0
        // one chunk pass serves the probe and the survivors' index write
        val chunks = Cdc.chunks(batch, idCol, textCol).localCheckpoint(true)
        val rejected = chunks
          .join(landed.select(col("fp")).distinct().withColumn("__hit", lit(1L)),
            Seq("fp"), "left")
          .groupBy(col("doc"))
          .agg(sum(col("n_toks")).as("__n"),
            sum(when(col("__hit").isNotNull, col("n_toks")).otherwise(lit(0L)))
              .as("__landed"))
          .filter(col("__landed").cast("double") >
            col("__n").cast("double") * maxLandedShare)
          .select(col("doc").as(idCol))
        val keptStable = batch.join(rejected, Seq(idCol), "left_anti")
          .localCheckpoint(true)
        chunks.join(keptStable.select(col(idCol).as("doc")), Seq("doc"), "left_semi")
          .select(col("fp")).distinct()
          .write.mode("overwrite").parquet(s"$indexRoot/batch=$batchId")
        keptStable.write.mode("overwrite").parquet(corpusPath.toString)
      }
  }
}
