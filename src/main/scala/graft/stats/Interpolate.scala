package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-filling linear interpolation over an ordered integer index — the
  * reference's Amelia fallback `zoo::na.approx(rule = 2)`
  * (`/root/reference/R/estimate-catch.R:364-399`): interior gaps are
  * linearly interpolated between the nearest non-null neighbours;
  * leading/trailing gaps carry the nearest value (rule = 2 endpoint
  * extension).
  *
  * Pure window arithmetic: `last(_, ignoreNulls)` looking back and
  * `first(_, ignoreNulls)` looking forward over the per-key ordered
  * frame — one exchange on the keys, no iteration, no driver state.
  */
object Interpolate {

  /** Adds `<valueCol>_filled`. `idxCol` must be an integer-like spine
    * position (e.g. epoch days), dense or not, unique within its key
    * group (it is the interpolation abscissa). */
  def linear(df: DataFrame, keys: Seq[String], idxCol: String, valueCol: String): DataFrame = {
    val back = Window.partitionBy(keys.map(col): _*).orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward look runs over the REVERSED ordering with a growing
    // frame: Spark evaluates UnboundedFollowing frames by recomputing
    // per row (O(n²) per group), while UnboundedPreceding frames are
    // incremental. The frame excludes the current row, which only
    // matters for null-v rows (non-null rows short-circuit below).
    val fwd = Window.partitionBy(keys.map(col): _*).orderBy(col(idxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val v = col(valueCol)
    df.withColumn("__pv", last(v, ignoreNulls = true).over(back))
      .withColumn("__pi", last(when(v.isNotNull, col(idxCol)), ignoreNulls = true).over(back))
      .withColumn("__nv", last(v, ignoreNulls = true).over(fwd))
      .withColumn("__ni", last(when(v.isNotNull, col(idxCol)), ignoreNulls = true).over(fwd))
      .withColumn(s"${valueCol}_filled",
        when(v.isNotNull, v)
          .when(col("__pv").isNull, col("__nv"))
          .when(col("__nv").isNull, col("__pv"))
          .otherwise(
            col("__pv") + (col("__nv") - col("__pv")) *
              (col(idxCol) - col("__pi")).cast("double") /
              (col("__ni") - col("__pi")).cast("double")))
      .drop("__pv", "__pi", "__nv", "__ni")
  }
}
