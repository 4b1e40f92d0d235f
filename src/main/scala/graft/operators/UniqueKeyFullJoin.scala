package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-outer match restricted to rows whose key is unique on each side,
  * appending the non-unique rows unmatched.
  *
  * Re-expresses the reference's central landings×GPS-trips merge
  * (`/root/reference/R/merge-trips.R:25-49`): each side flags keys with
  * exactly one row per key, the unique partitions are full-outer joined,
  * and the ambiguous (non-unique) partitions are appended with the other
  * side's columns null (`bind_rows` ⇒ `unionByName(allowMissingColumns)`).
  *
  * Scale notes: the uniqueness flag is a windowed count over the join
  * key, so it shares the exchange that the subsequent sort-merge join
  * needs — one shuffle per side total. No driver-side work.
  */
object UniqueKeyFullJoin {
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    def split(df: DataFrame) = {
      val flagged = df.withColumn("__n_per_key", count(lit(1)).over(w))
      (flagged.filter(col("__n_per_key") === 1).drop("__n_per_key"),
        flagged.filter(col("__n_per_key") > 1).drop("__n_per_key"))
    }
    val (lu, ln) = split(left)
    val (ru, rn) = split(right)
    lu.join(ru, keys, "full_outer")
      .unionByName(ln, allowMissingColumns = true)
      .unionByName(rn, allowMissingColumns = true)
  }
}
