package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured schema census — the schema-drift monitor for JSON
  * payload columns (event `props`, API traces): which keys occur, how
  * often, and with which value types, censused from the data instead
  * of declared. The per-row parse is `from_json` to map<string,string>
  * — Spark's Jackson path captures NON-string values as their raw JSON
  * text (numbers "1", bools "true", arrays "[1,2]"), so one parse
  * yields every key with a classifiable value and no per-key schema is
  * needed. Type classes are text-shape heuristics mirrored exactly by
  * the DuckDB oracle (which sees quoted strings and literal `null`
  * from json_extract — the classifications align, the raw texts need
  * not).
  *
  * Scale shape: one parse + explode per row, one census shuffle keyed
  * on the (bounded) key vocabulary. */
object JsonCensus {

  /** Per-key census over a JSON string column: occurrences (including
    * explicit nulls) and the value-type histogram. JSON `null` values
    * surface as SQL null map values (indistinguishable from a JSON
    * string "null" is avoided by classification order: SQL-null first). */
  def keyCensus(df: DataFrame, jsonCol: String): DataFrame = {
    val kv = df
      .select(explode(from_json(col(jsonCol),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
        .as(Seq("key", "v")))
    kv.groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_present"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(col("v").rlike("^-?[0-9]+$"), 1L).otherwise(0L)).as("n_int"),
        sum(when(col("v").rlike("^-?[0-9]+\\.[0-9]+$"), 1L).otherwise(0L))
          .as("n_double"),
        sum(when(col("v") === "true" || col("v") === "false", 1L)
          .otherwise(0L)).as("n_bool"),
        sum(when(col("v").startsWith("["), 1L).otherwise(0L)).as("n_array"),
        sum(when(col("v").isNotNull &&
          !col("v").rlike("^(-?[0-9]+(\\.[0-9]+)?|true|false)$") &&
          !col("v").startsWith("[") && !col("v").startsWith("{"), 1L)
          .otherwise(0L)).as("n_string"))
  }
}
