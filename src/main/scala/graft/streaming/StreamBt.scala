package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.stats.BradleyTerry

/** Streaming preference-strength maintenance — the online arm of
  * [[graft.stats.BradleyTerry]] and the pairwise-preference face of
  * [[StreamGraph]]'s warm-start pattern: each micro-batch of
  * comparisons lands in a partitioned pair store, and the strength
  * vector re-converges from the PREVIOUS batch's converged strengths
  * with `warmRounds` MM rounds over the accumulated log, instead of
  * re-iterating from uniform.
  *
  * State lives in storage (partitioned parquet, the [[StreamNovelty]]
  * discipline), not the state store: strengths survive restarts, any
  * batch job can read them, and the pair store is the system of
  * record — exactly what an arena-style ranking service republishes
  * after every ingest.
  *
  * Idempotency: the STRENGTHS marker (written last) is the commit
  * point — a re-delivered batchId finds
  * `strengths/batch=<id>/_SUCCESS` and no-ops; a crash between the
  * pair write and the strength write redoes both (both writes
  * overwrite). Work per batch: `warmRounds` broadcast-join MM rounds
  * over the accumulated pair table — the pair table is the
  * pre-aggregated comparison census (small relative to the raw
  * preference events it came from), the standard maintenance shape.
  */
object StreamBt {

  /** Latest committed strengths under `strengthsRoot` (None before
    * the first commit). */
  def latestStrengths(spark: SparkSession,
                      strengthsRoot: String): Option[(Long, DataFrame)] = {
    val path = new Path(strengthsRoot)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val batches = fs.globStatus(new Path(path, "batch=*"))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
    if (batches.isEmpty) None
    else {
      val latest = batches.max
      Some((latest, spark.read.parquet(s"$strengthsRoot/batch=$latest")))
    }
  }

  /** foreachBatch handler for a comparison stream (columns a, b,
    * wins_a, wins_b — one row per unordered item pair per batch):
    * append the batch's pairs to `pairsRoot/batch=<id>`, then write
    * `warmRounds` warm-started MM rounds over the accumulated pair
    * store to `strengthsRoot/batch=<id>`. */
  def strengthMaintenance(pairsRoot: String, strengthsRoot: String,
                          warmRounds: Int = 1): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val outPath = new Path(s"$strengthsRoot/batch=$batchId")
      val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(outPath, "_SUCCESS"))) {
        batch.select(col("a"), col("b"), col("wins_a"), col("wins_b"))
          .write.mode("overwrite").parquet(s"$pairsRoot/batch=$batchId")
        // re-aggregate the landed log to one row per unordered pair:
        // BradleyTerry.fit expects pair distinctness, and batches may
        // repeat a pair
        val landed = spark.read.parquet(pairsRoot)
          .groupBy(col("a"), col("b"))
          .agg(sum(col("wins_a")).as("wins_a"), sum(col("wins_b")).as("wins_b"))
        val strengths = latestStrengths(spark, strengthsRoot) match {
          case Some((prev, s0)) if prev != batchId =>
            BradleyTerry.continueFrom(landed, "a", "b", "wins_a", "wins_b",
              s0, warmRounds)
          case _ =>
            BradleyTerry.fit(landed, "a", "b", "wins_a", "wins_b", warmRounds)
        }
        strengths.write.mode("overwrite").parquet(outPath.toString)
      }
  }
}
