package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Water-filling budget allocation across domains — the fair-share
  * planner behind "give every source an equal token budget, except
  * sources that don't have that much": find the level L such that
  * Σ min(availᵢ, L) = budget, allocate min(availᵢ, L) to each domain,
  * and hand the integer remainder out one token each to the
  * lexicographically-first uncapped domains. The allocation is the
  * max-min-fair point (no domain can gain without a smaller-allocated
  * domain losing) — the standard shape for balancing a training
  * mixture under a total token budget without upsampling anything.
  *
  * Execution shape: the scan classic — sort domains by availability
  * ascending, prefix-sum, and the level falls out of the FIRST row
  * where (budget − prefix) div remaining ≤ avail — is two window
  * passes over the DOMAIN table, which is bounded (a mixture has
  * dozens of sources, not millions), so the single-partition global
  * sort is a non-issue at any corpus size; the corpus itself is only
  * touched by whatever aggregation produced the (domain, avail) frame.
  *
  * Numerics: pure int64 (`div` truncation + explicit remainder
  * distribution), so the allocation is deterministic, engine-exact,
  * and Σ alloc = min(budget, Σ avail) EXACTLY — the q165 oracle
  * replays every row.
  */
object WaterFill {

  /** `domains`: one row per domain with a long `avail` column.
    * Returns (domain, avail, alloc, capped): capped domains (avail ≤
    * level) receive all of `avail`; the rest receive level (+1 for the
    * remainder-distribution prefix). If budget ≥ Σ avail, every domain
    * is capped (alloc = avail). */
  def apply(domains: DataFrame, domainCol: String, availCol: String,
            budget: Long): DataFrame = {
    require(budget >= 0, "budget must be nonnegative")
    val w = Window.orderBy(col("avail"), col("domain"))
    val base = domains.select(
      col(domainCol).cast("string").as("domain"),
      col(availCol).cast("long").as("avail"))
    val n = Window.partitionBy()
    val scan = base
      .withColumn("__p_prev",
        coalesce(sum(col("avail")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__j", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("__rem", lit(budget) - col("__p_prev"))
      .withColumn("__cnt", col("__n") - col("__j") + 1)
      .withColumn("__lcand", expr("__rem div __cnt"))
    // the level row: first j (ascending avail) where the REAL water
    // line (budget − prefix)/(remaining) sits at or under that row's
    // availability — the test is rem ≤ avail·cnt, NOT the floored
    // lcand ≤ avail (floor accepts rows the real level overshoots,
    // losing budget). Absent ⇒ budget ≥ Σ avail, everyone capped.
    val level = scan
      .filter(col("__rem") <= col("avail") * col("__cnt"))
      .orderBy(col("__j"))
      .limit(1)
      .select(col("__lcand").as("__level"),
        (col("__rem") - col("__lcand") * col("__cnt")).as("__extra"))
    val leveled = scan.join(broadcast(level), joinExprs = lit(true), "left")
    // uncapped domains ordered by NAME take the +1 remainder tokens
    val uncappedRank = row_number().over(
      Window.partitionBy(col("__capped")).orderBy(col("domain")))
    leveled
      .withColumn("__capped", col("__level").isNull || col("avail") <= col("__level"))
      .withColumn("__r", uncappedRank)
      .select(col("domain"), col("avail"),
        when(col("__capped"), col("avail"))
          .otherwise(col("__level") +
            when(col("__r") <= col("__extra"), 1L).otherwise(0L)).as("alloc"),
        col("__capped").as("capped"))
  }
}
