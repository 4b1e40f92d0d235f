package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-preceding) join — the reference repeatedly matches an
  * event to the latest earlier record of the same device: landings to
  * the preceding trip end, alerts to the last seen tracker position
  * (`/root/reference/R/merge-trips.R:35-69`,
  * `R/validate-pds-trips.R:296-333` match on time proximity per IMEI).
  * Spark has no ASOF JOIN operator; the naive form — a range-predicate
  * join plus per-left-row max — explodes into an O(|L|·|R|) nested-loop
  * join per key.
  *
  * This implementation is the scalable union-sort form: stack both
  * sides, one window sort per key carries the most recent right-side
  * payload forward (growing frame, incremental O(n)), then keep the
  * left rows. ONE shuffle on the key, no pair blow-up, works at any
  * key cardinality/skew (AQE splits oversized partitions; the sort
  * spills).
  */
object AsOfJoin {

  /** For each `left` row, attach `payload` columns of the latest `right`
    * row with `right.tsCol <= left.tsCol`, matching on `keys`
    * (backward as-of join, inclusive). Right payload columns are null
    * when no earlier right row exists, or when the nearest one is more
    * than `tolerance` (in `tsCol` units, when >= 0) behind.
    *
    * Both sides must expose `keys` and `tsCol`; `tsCol` is numeric or
    * timestamp. Ties: a right row AT the left timestamp wins; equal
    * right timestamps resolve to the last in `payload` order — make the
    * right side unique per (keys, ts) for full determinism. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payload: Seq[String],
               tolerance: Long = -1L): DataFrame = {
    val leftCols = left.columns
    val clash = payload.toSet.intersect(leftCols.toSet) ++
      (if (leftCols.contains("asof_ts")) Seq("asof_ts") else Nil)
    require(clash.isEmpty,
      s"as-of payload/result columns collide with the left side: ${clash.mkString(", ")} — rename upstream")
    // stack: right rows sort before left rows at the same timestamp so
    // an exact-timestamp right row is visible to the left row
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast(right.schema(tsCol).dataType))
    val r = right.select(
      (keys.map(col) :+ col(tsCol) :+ col(tsCol).as("__rts")) ++
        payload.map(col): _*)
      .withColumn("__side", lit(0))
    val stacked = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(
      stacked.withColumn("__ats",
        last(when(col("__side") === 0, col("__rts")), ignoreNulls = true).over(w))) {
      (df, c) =>
        df.withColumn(s"__p_$c",
          last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    val withinTol =
      if (tolerance < 0) lit(true)
      else (col(tsCol).cast("long") - col("__ats").cast("long")) <= tolerance
    val out = carried.filter(col("__side") === 1)
    payload.foldLeft(out) { (df, c) =>
      df.withColumn(c, when(col("__ats").isNotNull && withinTol, col(s"__p_$c")))
    }
      .withColumn("asof_ts", when(withinTol, col("__ats")))
      .select((leftCols.map(col) :+ col("asof_ts")) ++ payload.map(col): _*)
  }
}
