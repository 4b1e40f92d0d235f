package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The nest/unnest kernel — the reference's signature data-model move
  * (SURVEY §1.1): rows sharing a key collapse into an ordered
  * array-of-struct column (`tidyr::nest`, `R/pt_nest_species.R:82-91`)
  * and explode back out (`tidyr::unnest`, with `keep_empty = TRUE`
  * preserving parent rows with empty children,
  * `R/calculate-weights.R:317-318`).
  *
  * `collect_list` ordering is nondeterministic under parallelism, so the
  * array is always sorted on an explicit order field — the same fix the
  * reference applies by carrying the species index `n`
  * (`R/calculate-weights.R:386`).
  */
object Nest {

  /** rows → one row per key with `as` = array<struct<payload…>> sorted
    * by `orderField`. One shuffle on the keys. */
  def nest(df: DataFrame, keys: Seq[String], payload: Seq[String],
           orderField: String, as: String): DataFrame = {
    require(payload.contains(orderField), s"orderField $orderField must be in payload")
    val st = struct((orderField +: payload.filterNot(_ == orderField)).map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(st)).as(as))
  }

  /** Nest children ONTO a parent frame — the `pt_nest_attachments`
    * composition (`R/pt_nest_attachments.R:40-72`): children nest per
    * key, left-join onto the parent, and a parent with NO children
    * keeps an EMPTY array — not a null array, and the row is not
    * dropped (`:61-67`: the reference empties the nested frame for
    * no-attachment submissions rather than dropping or null-ing it).
    * The empty-vs-null distinction survives a parquet round-trip and
    * drives `unnest(keepEmpty)` behavior downstream. */
  def nestOnto(parent: DataFrame, children: DataFrame, keys: Seq[String],
               payload: Seq[String], orderField: String, as: String): DataFrame = {
    val nested = nest(children, keys, payload, orderField, as)
    val emptyArr = array().cast(nested.schema(as).dataType)
    parent.join(nested, keys, "left")
      .withColumn(as, coalesce(col(as), emptyArr))
  }

  /** unnest: explode the array-of-struct back to child rows, promoting
    * struct fields to top-level columns. `keepEmpty = true` ⇒
    * `explode_outer` (parents with null/empty arrays survive with null
    * children). */
  def unnest(df: DataFrame, arrayCol: String, keepEmpty: Boolean = false): DataFrame = {
    val ex: Column = if (keepEmpty) explode_outer(col(arrayCol)) else explode(col(arrayCol))
    val fields = df.schema(arrayCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(st: org.apache.spark.sql.types.StructType, _) =>
        st.fieldNames.toSeq
      case other => sys.error(s"unnest: $arrayCol is $other, expected array<struct>")
    }
    val base = df.withColumn("__x", ex).drop(arrayCol)
    fields.foldLeft(base)((acc, f) => acc.withColumn(f, col(s"__x.$f"))).drop("__x")
  }
}
