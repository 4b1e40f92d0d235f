package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Consecutive-event chaining (SURVEY §2.5 W2): a trip whose start
  * follows the previous trip's end within a threshold is associated to
  * that previous trip (`/root/reference/R/validate-pds-trips.R:253-266`).
  * The reference chains *pairs* via `lag`, not transitive runs — that
  * exact semantic is preserved (a run a,b,c yields b→a and c→b, not
  * c→a).
  */
object Chain {

  /** Adds `associated_to`: the previous row's id when the gap (seconds)
    * from the previous row's `endCol` to this row's `startCol` is ≤
    * `maxGapSeconds`, else the row's own id. */
  def consecutive(df: DataFrame, key: String, startCol: String, endCol: String,
                  idCol: String, maxGapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(startCol), col(idCol))
    df.withColumn("__prev_end", lag(col(endCol), 1).over(w))
      .withColumn("__prev_id", lag(col(idCol), 1).over(w))
      .withColumn("gap_s",
        unix_timestamp(col(startCol)) - unix_timestamp(col("__prev_end")))
      .withColumn("associated_to",
        when(col("gap_s").isNotNull && col("gap_s") <= maxGapSeconds, col("__prev_id"))
          .otherwise(col(idCol)))
      .drop("__prev_end", "__prev_id")
  }

  /** A1: collapse chained pairs — first start, last end, member count
    * per (key, associated_to), with explicit orderings (min/max, not
    * order-dependent first/last). */
  def collapse(chained: DataFrame, key: String, startCol: String, endCol: String): DataFrame =
    chained.groupBy(col(key), col("associated_to"))
      .agg(
        min(col(startCol)).as("chain_start"),
        max(col(endCol)).as("chain_end"),
        count(lit(1)).as("n_members"))
}
