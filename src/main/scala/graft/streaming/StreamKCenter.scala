package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.similarity.KCenter

/** Streaming k-center maintenance by merge-and-reduce — the unbounded
  * face of the q226 coreset: each micro-batch Gonzalez-selects its own
  * ≤ k centers (distributed, [[KCenter.centers]]), unions them with the
  * landed center state (≤ k rows), and reduces the ≤ 2k candidates back
  * to k with the driver-side greedy ([[KCenter.reduceCenters]]). The
  * composition bound is the classic coreset argument: each step's
  * radius adds, so the maintained set covers everything seen within a
  * constant factor of the one-shot Gonzalez radius — the spec measures
  * it — while per-batch state stays k rows regardless of stream length.
  *
  * State discipline as the other storage-resident arms: center
  * snapshots land under `state/v=<batchId>` (parquet `_SUCCESS` is the
  * commit marker), loading takes the highest committed version below
  * the current batch, and a crash-redelivered batchId no-ops. */
object StreamKCenter {

  /** Latest committed center snapshot strictly below `batchId`. */
  def loadCenters(spark: SparkSession, stateRoot: String,
                  batchId: Long): Seq[KCenter.Center] = {
    val root = new Path(stateRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val vs = fs.globStatus(new Path(root, "v=*")).toSeq
      .map(_.getPath)
      .filter(p => fs.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(_ < batchId)
    if (vs.isEmpty) Seq.empty
    else spark.read.parquet(s"$stateRoot/v=${vs.max}")
      .select(col("ord"), col("id"), col("sv"), col("n2"))
      .collect()
      .map(r => KCenter.Center(r.getInt(0), r.getLong(1),
        r.getSeq[Long](2).toVector, r.getLong(3)))
      .sortBy(_.ord)
  }

  private def writeCenters(spark: SparkSession, cs: Seq[KCenter.Center],
                           path: String): Unit = {
    import spark.implicits._
    cs.map(c => (c.ord, c.id, c.sv, c.n2)).toDF("ord", "id", "sv", "n2")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** foreachBatch handler maintaining ≤ k centers under `stateRoot`. */
  def maintain(idCol: String, vecCol: String, k: Int,
               stateRoot: String): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val outPath = new Path(s"$stateRoot/v=$batchId")
      val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(outPath, "_SUCCESS"))) {
        val prev = loadCenters(spark, stateRoot, batchId)
        val n = batch.select(col(idCol)).distinct().count()
        val next =
          if (n == 0) prev
          else {
            val kb = math.min(k.toLong, n).toInt
            val batchCs = KCenter.centers(batch, idCol, vecCol, kb)
            KCenter.reduceCenters(
              (prev ++ batchCs).map(c => (c.id, c.sv)).distinct, k)
          }
        if (next.nonEmpty) writeCenters(spark, next, outPath.toString)
      }
  }
}
