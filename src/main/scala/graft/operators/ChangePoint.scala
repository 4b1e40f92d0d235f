package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Offline CUSUM change-point detection (Page 1954, the batch argmax
  * form): over an ordered series x₁..xₙ, the change point is
  * k* = argmax_i |S_i| with S_i = Σ_{j≤i}(x_j − x̄) — the prefix that
  * deviates most from the global mean marks where the level shifted.
  *
  * Numerics: the comparison is made DIVISION-FREE by scaling by n:
  * n·S_i = n·cum_i − i·T (cum = prefix sum, T = total), so with int64
  * inputs and DECIMAL(38,0)-routed products the argmax — and the two
  * segment means via truncating division — is engine-exact (the q153
  * truncating-division discipline; an IEEE x̄ would make |S_i| ties
  * engine-dependent).
  *
  * Scale shape: callers fold raw rows map-side into the ordered frame
  * first (a calendar of days, a spine of buckets — bounded by the
  * domain, not the row count); here it's one ordered window over that
  * bounded frame, a 1-row scalar cross for (n, T), and a top-1. */
object ChangePoint {

  /** Argmax-|CUSUM| row of `df` ordered by `ordCol`, with `valCol` an
    * integral (already scaled) measure. Returns one row:
    * (ordCol, i, n, score, mean_before, mean_after) — `score` is
    * |n·S_i| as double, means are truncating integer divisions of
    * `valCol` units, `mean_after` NULL when the argmax is the last
    * row. Ties break on the earliest `ordCol`, then the smallest `i`.
    *
    * Determinism under duplicate `ordCol` values: the prefix sum uses
    * an explicit ROWS frame with `valCol` as secondary sort — the
    * default RANGE frame would include all peers in `cum` while
    * `row_number` picks an arbitrary peer order, making the (i, cum)
    * pairing (and hence the argmax) nondeterministic. With the rows
    * frame and (ordCol, valCol) ordering, rows tied on both keys are
    * interchangeable, so the result is partitioning-invariant. */
  def cusum(df: DataFrame, ordCol: String, valCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val w = Window.orderBy(col(ordCol), col(valCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df
      .withColumn("i", row_number().over(
        Window.orderBy(col(ordCol), col(valCol))).cast("long"))
      .withColumn("cum", sum(col(valCol)).over(w))
      // two consumers (totals + scoring): land the bounded frame once
      .localCheckpoint(eager = false)
    val tot = cum.agg(max(col("i")).as("n"), sum(col(valCol)).as("t"))
    val scored = cum.crossJoin(tot) // 1-row scalar broadcast
      .withColumn("score",
        abs(col("n").cast(dec) * col("cum") - col("i").cast(dec) * col("t")))
    val wTop = Window.orderBy(col("score").desc, col(ordCol), col("i"))
    scored.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col(ordCol), col("i"), col("n"),
        round(col("score").cast("double"), 6).as("score"),
        expr("cum div i").as("mean_before"),
        when(col("n") > col("i"), expr("(t - cum) div (n - i)"))
          .as("mean_after"))
  }
}
