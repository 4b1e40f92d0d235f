package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, Novelty}

/** Streaming novelty-gated ingest — the unbounded-crawl face of
  * [[graft.dedup.Novelty]]: each micro-batch scores against the LANDED
  * shingle index, documents novel enough survive, and the survivors'
  * shingles become part of the index the NEXT batch probes. The landed
  * corpus is self-maintaining: templated chaff that repeats what the
  * corpus already holds stops accumulating at the gate.
  *
  * State lives in storage, not the state store: the index is a
  * partitioned parquet table (`batch=<id>` directories), so state
  * survives restarts, is readable by any batch job, and its size
  * tracks ACCEPTED content only. Idempotency follows the
  * [[IdempotentSink]] contract — a re-delivered batchId finds its
  * committed marker and no-ops, so both the corpus and the index stay
  * exactly-once under crash-replay. Work per batch is the batch's
  * shingles probing the index on the shingle key (the
  * [[Novelty.incrementalNovelty]] shape); the landed mass is never
  * rescanned.
  */
object StreamNovelty {

  /** The landed index across committed batches (empty-schema frame
    * when nothing has landed yet). */
  def landedIndex(spark: SparkSession, indexRoot: String): DataFrame = {
    val path = new Path(indexRoot)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.globStatus(new Path(path, "batch=*")).nonEmpty)
      spark.read.parquet(indexRoot)
    else {
      import spark.implicits._
      Seq.empty[(Long, String)].toDF("doc", "shingle")
    }
  }

  /** foreachBatch handler: score the batch against the landed index,
    * append documents with novelty ≥ `minNovelty` (shingle-less docs
    * survive iff `keepShort`) to `corpusRoot`, and their shingles to
    * `indexRoot`. Both writes are per-batchId idempotent. */
  def noveltyGate(idCol: String, textCol: String, k: Int,
                  minNovelty: Double, indexRoot: String, corpusRoot: String,
                  keepShort: Boolean = true): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val corpusPath = new Path(s"$corpusRoot/batch=$batchId")
      val fs = corpusPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the CORPUS marker (written last) is the commit point: a replay
      // after any partial state redoes both writes (both overwrite)
      if (!fs.exists(new Path(corpusPath, "_SUCCESS"))) {
        // exclude this batch's OWN index partition — present only on a
        // crash-replay that got through the index write; scoring the
        // batch against its own shingles would zero every novelty
        val landed0 = landedIndex(spark, indexRoot)
        val landed =
          if (landed0.columns.contains("batch"))
            landed0.filter(col("batch") =!= batchId).drop("batch")
          else landed0
        val scored = Novelty.incrementalNovelty(batch, landed, idCol, textCol, k)
        val kept =
          if (keepShort)
            // shingle-less docs are absent from `scored`; anti-join the
            // REJECTED ids so they survive
            batch.join(scored.filter(col("novelty") < minNovelty).select(col(idCol)),
              Seq(idCol), "left_anti")
          else batch.join(scored.filter(col("novelty") >= minNovelty)
            .select(col(idCol)), Seq(idCol), "left_semi")
        // one deterministic frame per batch: both writes see the same rows
        val keptStable = kept.localCheckpoint(true)
        Dedup.shingleIndex(keptStable, idCol, textCol, k)
          .write.mode("overwrite")
          .parquet(s"$indexRoot/batch=$batchId")
        keptStable.write.mode("overwrite").parquet(corpusPath.toString)
      }
  }
}
