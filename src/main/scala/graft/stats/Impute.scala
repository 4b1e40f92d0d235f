package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic predictive-mean-matching imputation — the reference's
  * legacy `mice` PMM step (`/root/reference/R/model-catch.R:466-516`)
  * re-expressed relationally: per group, fit y ~ x on observed rows
  * (closed-form [[Regression.fit]]), predict ŷ for every row, and give
  * each missing row the OBSERVED y of its nearest-ŷ donor. mice draws
  * randomly among the k nearest donors; here the single nearest donor
  * (ties → the earlier row in (ŷ, tiebreak) order) makes the operator
  * reproducible across engines and runs — ST8's seeded-determinism
  * policy.
  *
  * Scale shape: one aggregation for the fit (broadcast back), one
  * window sort per group for donor matching — the nearest observed
  * neighbour above/below in ŷ order via running last/first, so no
  * missing×observed pair join ever materializes.
  */
object Impute {

  /** Adds `yhat` (prediction) and `y_imputed` (observed y kept, missing
    * y filled by the nearest-ŷ donor's y; null when the group has no
    * observed rows). `tiebreak` columns must make (ŷ, tiebreak…) orders
    * equal-or-interchangeable for determinism. */
  def pmm(df: DataFrame, keys: Seq[String], x: String, y: String,
          tiebreak: Seq[String]): DataFrame = {
    val observed = df.filter(col(y).isNotNull)
    val coef = Regression.fit(observed, keys, x, y)
      .select((keys.map(col) :+ col("slope") :+ col("intercept")): _*)
    val scored = df.join(broadcast(coef), keys, "left")
      .withColumn("yhat", col("intercept") + col("slope") * col(x))
    val order = col("yhat") +: tiebreak.map(col)
    val before = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*).rowsBetween(Window.unboundedPreceding, -1)
    // nearest FOLLOWING observed row, found with a running frame over the
    // REVERSED ordering: an UnboundedFollowing frame would make Spark's
    // WindowExec recompute the aggregate per row (O(n²) per group —
    // UnboundedFollowingWindowFunctionFrame), while the growing
    // UnboundedPreceding frame is incremental; same row set because the
    // (ŷ, tiebreak) key is total
    val revOrder = col("yhat").desc +: tiebreak.map(col(_).desc)
    val after = Window.partitionBy(keys.map(col): _*)
      .orderBy(revOrder: _*).rowsBetween(Window.unboundedPreceding, -1)
    def obs(c: Column): Column = when(col(y).isNotNull, c)
    scored
      .withColumn("__py", last(obs(col(y)), ignoreNulls = true).over(before))
      .withColumn("__ph", last(obs(col("yhat")), ignoreNulls = true).over(before))
      .withColumn("__ny", last(obs(col(y)), ignoreNulls = true).over(after))
      .withColumn("__nh", last(obs(col("yhat")), ignoreNulls = true).over(after))
      .withColumn("y_imputed",
        when(col(y).isNotNull, col(y))
          .when(col("__py").isNull, col("__ny"))
          .when(col("__ny").isNull, col("__py"))
          // donor with the smaller |Δŷ|; tie → the earlier (prev) donor
          .when(col("yhat") - col("__ph") <= col("__nh") - col("yhat"), col("__py"))
          .otherwise(col("__ny")))
      .drop("__py", "__ph", "__ny", "__nh")
  }
}
