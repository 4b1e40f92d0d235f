package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Exact

/** Neyman (optimal) allocation of a fixed sample budget across strata
  * — the survey-design step behind stratified estimation (the
  * reference's municipal frames are exactly such strata) and behind
  * stratified eval-set sampling in corpus work: sample stratum h in
  * proportion to N_h · S_h (size × standard deviation), which
  * minimizes the variance of the stratified mean at a given total n.
  *
  * Everything is one aggregation plus per-row arithmetic:
  *  - per-stratum N_h, exact decimal-routed ΣX and ΣX², S_h from the
  *    one-pass variance identity (n·Σx² − (Σx)²) / (n·(n−1)) under a
  *    max(0, ·) guard against negative round-off;
  *  - raw share n·w_h with w_h = N_h·S_h / Σ N_h·S_h; zero-variance
  *    strata get weight 0 (nothing to learn from sampling them beyond
  *    one row — the textbook convention);
  *  - integerization by LARGEST-REMAINDER rounding (floor everything,
  *    then hand the leftover units to the largest fractional parts,
  *    ties by stratum key asc) so allocations sum to the budget
  *    EXACTLY and deterministically;
  *  - each stratum is finally capped at N_h (cannot sample more rows
  *    than exist), with capped leftover re-granted in the same
  *    remainder order — one more window pass, no iteration, exact
  *    when the budget is feasible (n ≤ ΣN_h over nonzero-weight
  *    strata; the uncapped path is the common case).
  *
  * Output: (stratum, n_rows, sd, weight, alloc). Deterministic and
  * engine-exact, so the whole design — including every rounding
  * decision — sits under the q194 hash gate. */
object Allocation {

  def neyman(df: DataFrame, stratumCol: String, xCol: String,
             budget: Long): DataFrame = {
    val x = col(xCol).cast("double")
    val per = df.groupBy(col(stratumCol))
      .agg(
        count(lit(1)).as("n_rows"),
        Exact.dsum(x).as("__s1"),
        Exact.dsum(x * x).as("__s2"))
      .withColumn("__var",
        when(col("n_rows") > 1,
          greatest((col("n_rows") * col("__s2") - col("__s1") * col("__s1")) /
            (col("n_rows").cast("double") * (col("n_rows") - 1.0)), lit(0.0)))
          .otherwise(lit(0.0)))
      .withColumn("sd", sqrt(col("__var")))
      .withColumn("__nhsh", col("n_rows").cast("double") * col("sd"))
    val tot = per.agg(Exact.dsum(col("__nhsh")).as("__tot"))
    val wAll = Window.partitionBy()
    // positive-weight strata rank FIRST: the leftover units and the cap
    // surplus must never leak into zero-variance strata the design
    // deliberately weighted 0 (both leaks caught by the conservation
    // property test)
    val remRank = Window.partitionBy()
      .orderBy((col("weight") > 0).desc,
        (col("__raw") - floor(col("__raw"))).desc, col(stratumCol).asc)
    val alloc0 = per.crossJoin(broadcast(tot))
      .withColumn("weight", when(col("__tot") > 0, col("__nhsh") / col("__tot"))
        .otherwise(lit(0.0)))
      .withColumn("__raw", col("weight") * budget)
      .withColumn("__base", floor(col("__raw")).cast("long"))
      .withColumn("__left", lit(budget) - sum(col("__base")).over(wAll))
      .withColumn("__rr", row_number().over(remRank))
      .withColumn("__alloc0",
        col("__base") + when(col("weight") > 0 && col("__rr") <= col("__left"),
          1L).otherwise(0L))
    // cap at N_h; re-grant capped surplus in the same remainder order to
    // strata with headroom (single extra window — exact whenever the
    // budget is feasible for the nonzero-weight strata)
    val capped = alloc0
      .withColumn("__cap", least(col("__alloc0"), col("n_rows")))
      .withColumn("__surplus", sum(col("__alloc0") - col("__cap")).over(wAll))
      // headroom ONLY for strata the design gave weight — the re-grant
      // must not leak budget into zero-variance strata the allocation
      // deliberately excluded (caught by the conservation property test)
      .withColumn("__head",
        when(col("weight") > 0, col("n_rows") - col("__cap")).otherwise(lit(0L)))
      .withColumn("__cumhead",
        sum(col("__head")).over(remRank.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("alloc",
        col("__cap") + greatest(lit(0L),
          least(col("__head"), col("__surplus") - (col("__cumhead") - col("__head")))))
    capped.select(col(stratumCol), col("n_rows"),
      round(col("sd"), 6).as("sd"), round(col("weight"), 6).as("weight"),
      col("alloc"))
  }
}
