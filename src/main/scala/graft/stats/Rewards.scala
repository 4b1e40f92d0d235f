package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Exact

/** Reward post-processing for preference/RL fine-tuning data — the
  * per-prompt candidate-group transforms between "reward model scored
  * N samples" and "trainer consumes advantages":
  *
  *  - group-relative advantage normalization (the GRPO estimator,
  *    Shao et al. 2024: A_i = (r_i − mean_group) / std_group) with a
  *    zero-variance guard (degenerate groups get advantage 0 — no
  *    gradient signal rather than a division blow-up);
  *  - best-of-n selection (rejection-sampling fine-tune sets): the
  *    argmax-reward candidate per group under a total tie-break.
  *
  * One aggregation on the group key broadcast back onto the rows (the
  * A8 grouped-mutate shape) — at 100 TB this is a single shuffle on
  * prompt id with map-side partial aggregation; groups are
  * candidate-count sized so no skew. Moments are decimal-routed
  * ([[Exact.dsum]]) so mean/std are bit-reproducible at any
  * parallelism; the per-row normalization is pure IEEE arithmetic.
  * Population (not Bessel) variance, matching the GRPO estimator.
  */
object Rewards {

  /** @return input columns + (advantage, best) */
  def groupNormalize(df: DataFrame, groupCol: String, rewardCol: String,
                     tieBreakCol: String): DataFrame = {
    val r = col(rewardCol).cast("double")
    val moments = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        Exact.dsum(r).as("__s1"),
        Exact.dsum(r * r).as("__s2"),
        max(struct(r.as("r"), col(tieBreakCol).cast("long").as("tb")))
          .as("__best"))
      .withColumn("__mean", col("__s1") / col("__n"))
      .withColumn("__var",
        greatest(col("__s2") / col("__n") - col("__mean") * col("__mean"),
          lit(0.0)))
      .withColumn("__sd", sqrt(col("__var")))
    df.join(moments, Seq(groupCol))
      .withColumn("advantage",
        when(col("__sd") > 0, (r - col("__mean")) / col("__sd"))
          .otherwise(lit(0.0)))
      // argmax under (reward, tieBreak) struct order: total and replayable
      .withColumn("best",
        r === col("__best.r") &&
          col(tieBreakCol).cast("long") === col("__best.tb"))
      .drop("__n", "__s1", "__s2", "__best", "__mean", "__var", "__sd")
  }
}
