package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling / data mixing for training-data
  * pipelines (builder mandate): downsample or cap each stratum (e.g.
  * language × source) toward a target mixture, reproducibly on any
  * engine and at any parallelism.
  *
  * All draws are md5-derived (the pipeline's ST8 seeded-determinism
  * policy): a document's fate depends only on its id and the salt,
  * never on partitioning, row order, or an engine RNG — so byte-
  * identical corpora come out of every rerun, and the DuckDB oracle
  * reproduces the sample exactly.
  *
  * Scale shapes: [[sampleByRate]] is a pure filter (no shuffle, no
  * state — the 100 TB default); [[takePerStratum]] caps strata by
  * hash-rank, one window per stratum (shuffle on the strata keys;
  * rank, not global sort).
  */
object Sampling {

  /** md5-derived uniform draw in [0, 1): first 7 hex chars → 28-bit
    * int / 2²⁸. Salt decorrelates successive sampling stages (the same
    * doc keeps or drops independently across stages). */
  def hashUnit(id: Column, salt: String): Column =
    conv(substring(md5(concat_ws("-", lit(salt), id.cast("string"))), 1, 7), 16, 10)
      .cast("double") / lit(268435456.0)

  /** Keep each row of stratum s with its configured rate (strata with
    * no configured rate keep `defaultRate`). Pure per-row filter. */
  def sampleByRate(df: DataFrame, stratumCol: Column, idCol: Column,
                   rates: Map[String, Double], defaultRate: Double = 1.0,
                   salt: String = "mix"): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val rate = rates.foldLeft(when(lit(false), lit(defaultRate))) {
      case (acc, (k, r)) => acc.when(stratumCol === k, lit(r))
    }.otherwise(lit(defaultRate))
    df.filter(hashUnit(idCol, salt) < rate)
  }

  /** [[sampleByRate]] with rates from a PLAN frame (e.g.
    * [[mixturePlan]] output) instead of a static map: rates broadcast-
    * join onto the rows; strata missing from the plan drop (rate 0). */
  def sampleByPlan(df: DataFrame, stratumCol: String, idCol: Column,
                   plan: DataFrame, salt: String = "mix"): DataFrame =
    df.join(broadcast(plan.select(col(stratumCol), col("rate"))),
        Seq(stratumCol), "left")
      .filter(hashUnit(idCol, salt) < coalesce(col("rate"), lit(0.0)))
      .drop("rate")

  /** Cap each stratum at `n` rows, keeping the hash-minimal ones — a
    * deterministic "reservoir" whose membership is stable under any
    * partitioning and ONLY changes at the margin when the stratum
    * grows. One rank window per stratum. */
  def takePerStratum(df: DataFrame, strata: Seq[String], idCol: Column,
                     n: Int, salt: String = "cap"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*)
      .orderBy(hashUnit(idCol, salt), idCol) // id tiebreak: total order
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Mixture planning: given the observed per-stratum weight (e.g.
    * token counts) and target mixture proportions, the per-stratum
    * sampling rates that realize the target with NO upsampling — the
    * binding stratum (smallest observed/target ratio) keeps rate 1 and
    * everything else downsamples to match. Input: (stratum, observed);
    * output: (stratum, observed, target_share, rate). Strata absent
    * from `targets` get rate 0 (excluded from the mix). Runs as one
    * tiny aggregate + projection — call it on a per-stratum rollup,
    * not raw rows. */
  /** Temperature-scaled mixture planning: target shares derived from
    * the observed weights themselves, `share_i ∝ observed_i^tau` — the
    * standard multilingual rebalancing knob (tau = 1 keeps the natural
    * mix, tau → 0 approaches uniform, tau = 0.3–0.7 the usual
    * low-resource boost). Rates then realize those shares with NO
    * upsampling exactly like [[mixturePlan]]: the binding stratum keeps
    * rate 1, the rest downsample. Output: (stratum, observed, share,
    * rate). One tiny aggregate + projection over the per-stratum
    * rollup. `pow` is the one transcendental here — callers gating on
    * an ANSI oracle should round the outputs on both sides (the
    * repo-wide convention for transcendental edges). */
  def temperaturePlan(observed: DataFrame, stratumCol: String,
                      weightCol: String, tau: Double): DataFrame = {
    require(tau > 0, s"tau must be positive, got $tau")
    val base = observed.select(col(stratumCol),
        col(weightCol).cast("double").as("observed"))
      .withColumn("__wt", pow(col("observed"), lit(tau)))
    // order-independent total (decimal-routed): a plain double sum's
    // value depends on add order across partitions
    val tot = base.agg(graft.core.Exact.dsum(col("__wt")).as("__tot"))
    val shared = base.crossJoin(broadcast(tot))
      .withColumn("share", col("__wt") / col("__tot"))
      .drop("__wt", "__tot")
    val scale = shared.filter(col("share") > 0)
      .agg(min(col("observed") / col("share")).as("__scale"))
    shared.crossJoin(broadcast(scale))
      .withColumn("rate",
        when(col("share") === 0.0, lit(0.0))
          .otherwise(least(lit(1.0), col("share") * col("__scale") / col("observed"))))
      .drop("__scale")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirtes A-ES):
    * keep the n rows with the largest `u^(1/w)` — equivalently, the
    * largest `ln(u)/w`, which avoids `pow` and its cross-engine
    * rounding. Each row's inclusion probability is proportional to its
    * weight at every prefix of the order, so e.g. weighting by a
    * quality score keeps a deterministic, quality-tilted corpus subset.
    *
    * The uniform is md5-derived with a +0.5 offset — `(h28 + 0.5) /
    * 2^28` lies strictly inside (0, 1), so `ln` never sees 0 — and the
    * key order is total (id tie-break), so membership is reproducible
    * at any parallelism and replayable by the SQL oracle.
    *
    * Scale shape: a per-row key projection, then `orderBy(...).limit(n)`
    * — Spark plans that as TakeOrderedAndProject (per-partition bounded
    * top-n heaps merged once), NOT a global sort; driver memory is
    * O(n). Rows with weight ≤ 0 or null are excluded (zero weight =
    * zero inclusion probability; A-ES has no meaning for negatives). */
  def weightedSample(df: DataFrame, idCol: Column, weightCol: Column,
                     n: Int, salt: String = "wsamp"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val u = (conv(substring(md5(concat_ws("-", lit(salt), idCol.cast("string"))),
      1, 7), 16, 10).cast("double") + lit(0.5)) / lit(268435456.0)
    df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("__key", log(u) / weightCol.cast("double"))
      .orderBy(col("__key").desc, idCol)
      .limit(n)
      .drop("__key")
  }

  /** Per-group A-ES weighted sample without replacement (Efraimidis &
    * Spirakis 2006): within every group, the `n` rows with the largest
    * ln(u)/w keys — u an md5 draw, so the draw replays anywhere — are
    * a weight-proportional sample without replacement of that group
    * (the grouped face of [[weightedSample]]; stratified eval-set
    * drawing). The rank is spelled row_number + filter so the
    * [[graft.plans.TopKPerKey]] rewrite plans a bounded per-key heap
    * instead of a full per-group sort. Zero/null weights are never
    * drawn. */
  def weightedSamplePerGroup(df: DataFrame, groupCols: Seq[String],
                             idCol: Column, weightCol: Column, n: Int,
                             salt: String = "wsamp"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val u = (conv(substring(md5(concat_ws("-", lit(salt), idCol.cast("string"))),
      1, 7), 16, 10).cast("double") + lit(0.5)) / lit(268435456.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__key").desc, idCol)
    df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("__key", log(u) / weightCol.cast("double"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__key", "__rn")
  }

  def mixturePlan(observed: DataFrame, stratumCol: String, weightCol: String,
                  targets: Map[String, Double]): DataFrame = {
    require(targets.values.forall(_ > 0), "target shares must be positive")
    val total = targets.values.sum
    val share = targets.foldLeft(when(lit(false), lit(0.0))) {
      case (acc, (k, s)) => acc.when(col(stratumCol) === k, lit(s / total))
    }.otherwise(lit(0.0))
    val base = observed.select(col(stratumCol), col(weightCol).cast("double")
      .as("observed"))
      .withColumn("target_share", share)
    // scale chosen so the binding stratum is fully used: the achievable
    // mixture total = min over strata of observed/share
    val scale = base.filter(col("target_share") > 0)
      .agg(min(col("observed") / col("target_share")).as("__scale"))
    base.crossJoin(broadcast(scale))
      .withColumn("rate",
        when(col("target_share") === 0.0, lit(0.0))
          .otherwise(least(lit(1.0),
            col("target_share") * col("__scale") / col("observed"))))
      .drop("__scale")
  }
}
