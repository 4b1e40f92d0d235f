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

  /** Ordered, FIRST-match-wins recode — `case_when` semantics for
    * dictionaries where a key appears under more than one arm (the
    * reference's species map lists code 116 under both "11" and "31";
    * the earlier arm wins, `R/clean-raw-data.R:130,151`). Targets may be
    * None (recode to null, e.g. landing site "LOR",
    * `R/clean-raw-data.R:393-397`). Unmatched values pass through. */
  def recodeOrdered(c: Column, entries: Seq[(String, Option[String])]): Column =
    entries.foldLeft(when(lit(false), lit(null).cast("string"))) {
      case (acc, (from, to)) =>
        acc.when(c === lit(from), to.map(lit).getOrElse(lit(null).cast("string")))
    }.otherwise(c)

  /** Union N frames by column name, null-filling columns a frame lacks
    * (`bind_rows`, `R/merge-landings.R:102-105`). */
  def unionByNameAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** `clean_catches`' prefix-family merge (`R/clean-raw-data.R:36-90`):
    * the same logical column arrives under several form-version
    * prefixes ("Spp.", "Species.", "Species/", …); for every suffix
    * present under any prefix, the per-prefix columns are coalesced IN
    * PREFIX-LIST ORDER into one column named by the suffix (the
    * reference's column-wise `coalesce(!!!prefix_list)`). Non-prefixed
    * columns pass through. Name resolution is driver-side over
    * `df.columns` (schema-sized); the result is one wide projection. */
  def coalescePrefixFamilies(df: DataFrame, prefixes: Seq[String]): DataFrame = {
    def raw(c: String): Column = col(s"`$c`")
    val matched = for {
      c <- df.columns.toSeq
      p <- prefixes.find(c.startsWith).toSeq
    } yield (c.stripPrefix(p), p, c)
    val families: Seq[(String, Seq[String])] = matched
      .groupBy(_._1).view
      .mapValues(hits => hits.sortBy { case (_, p, _) => prefixes.indexOf(p) }
        .map(_._3)).toSeq
      .sortBy(_._1)
    val passthrough = df.columns.toSeq
      .filterNot(c => prefixes.exists(c.startsWith)).map(raw)
    df.select(passthrough ++ families.map { case (suffix, sources) =>
      coalesce(sources.map(raw): _*).as(suffix)
    }: _*)
  }
}
