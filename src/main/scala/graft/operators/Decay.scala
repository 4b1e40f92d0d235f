package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially time-decayed aggregates — the "trending now" score a
  * feed/frontier ranker keeps per key (event type, domain, topic):
  * each event contributes 2^(−age/halfLife), so recent activity
  * dominates and stale mass halves every `halfLife` days. The same
  * shape ranks crawl frontiers by recency-weighted citation and decays
  * document popularity priors in curation mixes.
  *
  * Exactness discipline: IEEE `pow(0.5, age/h)` would make sums
  * partition-order dependent and engine-divergent. Instead age buckets
  * are INTEGER half-life steps k = ⌊age_days/halfLife⌋ and each
  * event's weight is the exact long 2^(50−k) (a power of two, exact in
  * any engine); the per-group sum runs in DECIMAL(38,0) — int64 would
  * overflow at just 2^13 ≈ 8k same-day events per group (the sf0.1
  * scale probe caught exactly that), while decimal gives 1e38/2^50 ≈
  * 8.8e22 events of headroom, exact and associative at any corpus
  * size (the kappa/alpha DECIMAL routing precedent). Only the final
  * division by 2^50 is floating point — bit-equal everywhere. Events
  * older than 50 half-lives weigh 0 (their true weight < 2^-50 ≈
  * 9e-16 — below double resolution of any realistic score anyway);
  * the cutoff is part of the contract and replayed by the oracle.
  *
  * Scale shape: one 1-row scalar aggregate for the reference date
  * (broadcast, never collected), then a map-only weight projection and
  * ONE map-side-combined groupBy — the cheapest possible plan at any
  * corpus size.
  */
object Decay {

  /** Per-group decayed score: (keys..., n_events, decayed_score) with
    * score = Σ 2^(−⌊age_days/halfLifeDays⌋), age measured back from
    * the newest event date in `df`. */
  def halfLifeScores(df: DataFrame, tsCol: Column, keys: Seq[String],
                     halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    val ref = df.agg(max(to_date(tsCol)).as("__ref"))
    val weighted = df
      .crossJoin(broadcast(ref)) // 1-row scalar broadcast, the q21 pattern
      .withColumn("__k",
        floor(datediff(col("__ref"), to_date(tsCol)) / lit(halfLifeDays)).cast("int"))
      .withColumn("__w",
        when(col("__k") <= 50, expr("shiftleft(CAST(1 AS BIGINT), 50 - __k)"))
          .otherwise(lit(0L)))
    weighted.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        (sum(col("__w").cast("decimal(38,0)")).cast("double") /
          lit(math.pow(2.0, 50))).as("__s"))
      .withColumn("decayed_score", round(col("__s"), 6))
      .drop("__s")
  }
}
