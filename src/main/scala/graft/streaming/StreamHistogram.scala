package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming equi-width histogram — the incremental arm of the q289
  * profiler face (the [[StreamHll]]/[[StreamKll]] symmetry applied to
  * distributions): bucket EDGES are FROZEN from a landed batch profile
  * (the q289 min/max census — exactly how production profilers work:
  * edges come from the last full profile, arrivals only bump counts),
  * each micro-batch buckets its rows with the SAME integer expression
  * as the batch face (`(x−min)·16 div (max−min+1)` — no float edges),
  * and per-(column, bucket) counts run as a plain streaming aggregate
  * in Update mode. Counts are additive, so stream ≡ batch EXACTLY for
  * in-range values (StreamHistogramSpec pins it); arrivals OUTSIDE the
  * frozen range clamp to the end buckets — end-bucket mass growing is
  * precisely the drift signal that schedules a re-profile (the q261
  * `cellCensus` discipline applied to columns).
  */
object StreamHistogram {

  /** Bucket a stream against frozen `edges` (col_name, min_e2, max_e2 —
    * the q289 census) and count per (col_name, bucket) in Update mode.
    * `cols` maps stream columns into the same e2 quantization the batch
    * face used. */
  def counts(stream: DataFrame, cols: Seq[String], edges: DataFrame,
             nBuckets: Int = 16): DataFrame = {
    require(nBuckets > 0)
    val stacked = stream.select(explode(map(cols.flatMap(c =>
      Seq(lit(c), floor(col(c) * 100 + 0.5).cast("long"))): _*))
      .as(Seq("col_name", "x_e2")))
      .filter(col("x_e2").isNotNull)
    stacked
      .join(broadcast(edges.select(col("col_name"), col("min_e2"), col("max_e2"))),
        Seq("col_name")) // stream-static broadcast join on the frozen census
      .withColumn("bucket",
        greatest(lit(0L), least(lit(nBuckets - 1L), expr(
          s"((x_e2 - min_e2) * $nBuckets) div (max_e2 - min_e2 + 1)"))))
      .groupBy(col("col_name"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }
}
