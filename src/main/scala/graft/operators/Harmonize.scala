package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-drift harmonization: the reference ingests three survey
  * versions whose columns drifted, renames them onto one vocabulary,
  * coalesces duplicate columns, recodes values through lookup maps, and
  * unions by name (`/root/reference/R/clean-raw-data.R:45-68,237-253`,
  * `R/merge-landings.R:102-163`). These are the Spark-first equivalents.
  */
object Harmonize {

  /** Rename any column matching a (from → to) map; unmapped columns kept. */
  def renameAll(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping)

  /** `coalist`: coalesce a list of possibly-missing same-meaning columns
    * into one canonical column, dropping the sources
    * (`R/clean-raw-data.R:237-253`). Missing columns contribute nulls.
    */
  def coalesceInto(df: DataFrame, target: String, sources: Seq[String]): DataFrame = {
    val present = sources.filter(df.columns.contains)
    val merged: Column =
      if (present.isEmpty) lit(null).cast("string")
      else coalesce(present.map(col): _*)
    df.withColumn(target, merged).drop(present.filterNot(_ == target): _*)
  }

  /** Value recode through a small dictionary compiled into a codegen'd
    * `when` chain (the reference's big `case_when` lookup maps,
    * `R/clean-raw-data.R:113-176`). For dictionaries too large for a
    * when-chain, use a broadcast join instead. */
  def recode(c: Column, dict: Map[String, String], keepUnmatched: Boolean = true): Column = {
    val base: Column = if (keepUnmatched) c else lit(null).cast("string")
    dict.foldLeft(base) { case (acc, (from, to)) => when(c === lit(from), lit(to)).otherwise(acc) }
  }

  /** Union N frames by column name, null-filling columns a frame lacks
    * (`bind_rows`, `R/merge-landings.R:102-105`). */
  def unionByNameAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
}
