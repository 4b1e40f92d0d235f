package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PageRank

/** Streaming link-graph maintenance — the unbounded-crawl face of
  * [[graft.graph.PageRank.continueFrom]]: each micro-batch of edges
  * lands in a partitioned edge store, and the rank vector warm-starts
  * from the PREVIOUS batch's converged ranks instead of re-iterating
  * from uniform over the whole accumulated graph. State lives in
  * storage (partitioned parquet, the [[StreamNovelty]] discipline),
  * not the state store: ranks survive restarts, any batch job can
  * read them, and the edge store is the system of record.
  *
  * Idempotency: the RANKS marker (written last) is the commit point —
  * a re-delivered batchId finds `ranks/batch=<id>/_SUCCESS` and
  * no-ops; a crash between the edge write and the rank write redoes
  * both (both writes overwrite). Work per batch: one warm round over
  * the accumulated edge list (edge mass is re-read, but never
  * re-tokenized/re-crawled — edges are small relative to the pages
  * they came from; at web scale this is the standard
  * rank-maintenance shape).
  */
object StreamGraph {

  /** Latest committed ranks under `ranksRoot` (None before the first
    * commit). */
  def latestRanks(spark: SparkSession, ranksRoot: String): Option[(Long, DataFrame)] = {
    val path = new Path(ranksRoot)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val batches = fs.globStatus(new Path(path, "batch=*"))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
    if (batches.isEmpty) None
    else {
      val latest = batches.max
      Some((latest, spark.read.parquet(s"$ranksRoot/batch=$latest")))
    }
  }

  /** foreachBatch handler for an edge stream (columns src, dst, w):
    * append the batch's edges to `edgesRoot/batch=<id>`, then write
    * `warmRounds` warm-started rank rounds over the accumulated edge
    * store to `ranksRoot/batch=<id>`. */
  def rankMaintenance(edgesRoot: String, ranksRoot: String,
                      warmRounds: Int = 1): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val ranksPath = new Path(s"$ranksRoot/batch=$batchId")
      val fs = ranksPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(ranksPath, "_SUCCESS"))) {
        batch.select(col("src"), col("dst"), col("w"))
          .write.mode("overwrite").parquet(s"$edgesRoot/batch=$batchId")
        val edges = spark.read.parquet(edgesRoot)
          .select(col("src"), col("dst"), col("w"))
        val ranks = latestRanks(spark, ranksRoot) match {
          case Some((prev, r0)) if prev != batchId =>
            PageRank.continueFrom(edges, r0, warmRounds)
          case _ => PageRank.run(edges, warmRounds)
        }
        ranks.write.mode("overwrite").parquet(ranksPath.toString)
      }
  }
}
