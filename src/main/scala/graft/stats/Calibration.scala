package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Exact

/** Probability-calibration census — the evaluation a score-gated
  * curation pipeline (q135's classifier gate, quality rerankers) runs
  * before trusting its thresholds: fixed-width reliability buckets of
  * the predicted probability vs the empirical positive rate, plus
  * each bucket's Expected Calibration Error contribution
  * (n_b/N · |conf_b − acc_b| — the standard ECE decomposition, which
  * the caller sums for the headline number).
  *
  * One aggregation over (floor-bucketed score, label), one 1-row
  * broadcast of the total: two bounded shuffles at any corpus size,
  * bucket-grain output. Bucketing is `floor(score · nBuckets)` with
  * the score-1.0 edge folded into the top bucket — pure IEEE, so any
  * engine replays every bucket boundary; means ride the exact
  * decimal-routed sums. */
object Calibration {

  /** Per-bucket rows: (bucket, n, conf, acc, gap, ece_contrib), all
    * doubles rounded to 6. `scoreCol` must lie in [0, 1]; `labelCol`
    * is 0/1 (numeric). */
  def census(df: DataFrame, scoreCol: String, labelCol: String,
             nBuckets: Int = 10): DataFrame = {
    val sc = col(scoreCol).cast("double")
    val per = df
      .withColumn("bucket",
        least(floor(sc * nBuckets), lit(nBuckets - 1L)).cast("long"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        Exact.dsum(sc).as("__ssum"),
        Exact.dsum(col(labelCol).cast("double")).as("__lsum"))
    val tot = per.agg(sum(col("n")).as("__N"))
    per.crossJoin(broadcast(tot))
      .withColumn("conf", col("__ssum") / col("n"))
      .withColumn("acc", col("__lsum") / col("n"))
      .withColumn("gap", abs(col("conf") - col("acc")))
      .select(col("bucket"), col("n"),
        round(col("conf"), 6).as("conf"),
        round(col("acc"), 6).as("acc"),
        round(col("gap"), 6).as("gap"),
        round(col("n").cast("double") / col("__N") * col("gap"), 6)
          .as("ece_contrib"))
  }
}
