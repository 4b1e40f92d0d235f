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

  /** Exact ROC-AUC via the Mann–Whitney rank statistic with
    * tie-AVERAGED ranks (the textbook estimator — a random tie-break
    * would make the figure partition-dependent): group by distinct
    * score, one cumulative window in score order gives each tie group
    * its average rank, and
    * AUC = (Σ_pos avg_rank − n₊(n₊+1)/2) / (n₊·n₋). Work is one
    * aggregation + one window over DISTINCT scores — bounded by score
    * RESOLUTION, not rows, which is the scale contract: quantize the
    * score first (e.g. `round(score, 6)` — the binned-AUC convention,
    * ≤ 2e6 distinct values through the single-partition rank window
    * regardless of corpus size; q201 does exactly this). Raw
    * continuous scores would make the distinct-score frame corpus-
    * sized. Returns one row: (n_pos, n_neg, auc, gini); AUC is NULL
    * when either class is empty (undefined, not 0.5). Ranks are
    * integers and averages exact halves, so the figure is
    * engine-exact before the final division. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df.groupBy(col(scoreCol).cast("double").as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(col(labelCol).cast("long")).as("__npos"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__s").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    byScore
      .withColumn("__cum", sum(col("__n")).over(w))
      .withColumn("__avg_rank",
        (col("__cum") - col("__n") + 1).cast("double") + (col("__n") - 1) / 2.0)
      .agg(
        sum(col("__npos")).as("n_pos"),
        (sum(col("__n")) - sum(col("__npos"))).as("n_neg"),
        Exact.dsum(col("__npos") * col("__avg_rank")).as("__rsum"))
      .select(col("n_pos"), col("n_neg"),
        round(when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("__rsum") - col("n_pos").cast("double") * (col("n_pos") + 1) / 2.0) /
            (col("n_pos") * col("n_neg")).cast("double")), 6).as("auc"))
      .withColumn("gini", round(lit(2.0) * col("auc") - 1.0, 6))
  }
}
