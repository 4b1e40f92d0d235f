package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift census between two corpus snapshots — the
  * monitoring operator a continuously-ingesting pipeline runs between
  * crawl snapshots / training-mix versions before promoting one:
  * per-bucket shares in the REFERENCE and CURRENT snapshots with the
  * standard drift decompositions,
  *
  *  - PSI (population stability index) contribution per bucket:
  *    (p_cur − p_ref) · ln(p_cur / p_ref); Σ < 0.1 is conventionally
  *    stable, > 0.25 actionable drift;
  *  - Jensen–Shannon divergence contribution per bucket (base e):
  *    ½·p_cur·ln(p_cur/m) + ½·p_ref·ln(p_ref/m), m = (p_cur+p_ref)/2 —
  *    bounded and symmetric where PSI explodes on vanishing buckets.
  *
  * Shares are floored at `eps` (the standard PSI zero-bucket guard) so
  * buckets present in only one snapshot contribute a finite,
  * deterministic penalty instead of ±∞. Execution: one count per side
  * (map-combined), a full outer on the bucket key, and per-row
  * arithmetic — two bounded shuffles at any corpus size, output is
  * bucket-grain (schema-sized). All arithmetic is plain IEEE
  * (count/total division, ln) so any engine replays it exactly —
  * the same portability contract as the log1p MAD machinery. */
object Drift {

  /** Per-bucket drift rows: (bucket keys…, n_ref, n_cur, share_ref,
    * share_cur, psi_contrib, js_contrib). Inputs must both carry the
    * `keys` columns and be NON-EMPTY (an empty snapshot has no
    * distribution to compare — shares would divide by a zero total);
    * rows are the unit of mass (pre-aggregate to another grain
    * upstream if needed). NULL bucket keys follow SQL join semantics:
    * each side's null-keyed bucket reports with the other side at 0. */
  def census(ref: DataFrame, cur: DataFrame, keys: Seq[String],
             eps: Double = 1e-6): DataFrame = {
    def side(df: DataFrame, n: String) = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(n))
    val joined = side(ref, "n_ref").join(side(cur, "n_cur"), keys, "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    // totals as 1-row broadcast scalars (cross join, never per-row aggs)
    val totals = joined.groupBy()
      .agg(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"))
    val pr = greatest(col("n_ref").cast("double") / col("__tr"), lit(eps))
    val pc = greatest(col("n_cur").cast("double") / col("__tc"), lit(eps))
    val m = (pr + pc) / 2.0
    joined.crossJoin(broadcast(totals))
      .select(keys.map(col) ++ Seq(
        col("n_ref"), col("n_cur"),
        pr.as("share_ref"), pc.as("share_cur"),
        ((pc - pr) * log(pc / pr)).as("psi_contrib"),
        (pc * log(pc / m) / 2.0 + pr * log(pr / m) / 2.0).as("js_contrib")): _*)
  }
}
