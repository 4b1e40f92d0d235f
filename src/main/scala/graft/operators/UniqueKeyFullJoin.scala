package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-outer match restricted to rows whose key is unique on each side,
  * appending the non-unique rows unmatched.
  *
  * Re-expresses the reference's central landings×GPS-trips merge
  * (`/root/reference/R/merge-trips.R:25-49`): each side flags keys with
  * exactly one row per key, the unique partitions are full-outer
  * matched, and the ambiguous (non-unique) rows pass through with the
  * other side's columns null (`bind_rows` semantics).
  *
  * Execution shape: instead of splitting each side into unique /
  * ambiguous partitions and union-ing three branches (which plans each
  * input subtree TWICE — measured on q95, where the left side is the
  * whole validate-landings fold, the duplicate evaluation dominated the
  * composition), the key is SALTED: unique rows carry an empty salt and
  * match normally; rows sharing a key get a side-prefixed row number
  * that can never equal anything on the other side, so they flow
  * through the SAME full-outer join unmatched. One evaluation of each
  * input and one exchange per side — the windowed uniqueness count
  * shares the exchange the sort-merge join needs. No driver-side work.
  */
object UniqueKeyFullJoin {
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    // row_number over an all-ties ordering is still unique within the
    // key partition, which is all the salt needs; salted rows never
    // match and the salt is dropped, so the arbitrary tie order never
    // reaches the output.
    def salted(df: DataFrame, prefix: String) =
      df.withColumn("__ukfj_salt",
        when(count(lit(1)).over(w) === 1, lit(""))
          .otherwise(concat(lit(prefix),
            row_number().over(w.orderBy(keys.map(col): _*)))))
    salted(left, "L:")
      .join(salted(right, "R:"), keys :+ "__ukfj_salt", "full_outer")
      .drop("__ukfj_salt")
  }
}
