package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Portal-export formatting (`/root/reference/R/export.R:93-248`):
  * ontology renames, the human-readable period labels of
  * `format_aggregated_data`, and the taxa-by-group lookup.
  */
object Export {

  /** `rename_ontology` (`export.R:202-248`): sequential substring
    * substitutions over COLUMN NAMES — including the reference's
    * documented hazard that the `gear` → `gear_type` pattern rewrites
    * any name containing "gear" (so `propulsion_gear` becomes
    * `propulsion_gear_type`). Replicated verbatim: it is the shipped
    * portal schema. */
  val OntologySubs: Seq[(String, String)] = Seq(
    "catch_price" -> "revenue",
    "municipality" -> "region",
    "landing_catch" -> "landing_weight",
    "catch_preservation" -> "conservation_place",
    "gear" -> "gear_type")

  def renameOntology(df: DataFrame): DataFrame =
    df.columns.foldLeft(df) { (acc, c) =>
      val renamed = OntologySubs.foldLeft(c) { case (n, (pat, rep)) =>
        n.replace(pat, rep)
      }
      if (renamed == c) acc else acc.withColumnRenamed(c, renamed)
    }

  /** `format_aggregated_data` period labels (`export.R:93-134`): the
    * grain-specific display strings R's `format()` produces —
    * "%d %b %y" for day/week bins, "%B %Y" (plus a "%Y" year column)
    * for month bins, "%Y" for year bins — and the national frames'
    * constant `n_boats`. Labels use Spark's locale-stable patterns
    * (`dd MMM yy` / `MMMM yyyy` / `yyyy`). */
  def aggregatedLabels(df: DataFrame, grain: String,
                       nBoats: Option[Long] = None): DataFrame = {
    val labelled = grain match {
      case "day" =>
        df.withColumn("day", date_format(col("date_bin_start"), "dd MMM yy"))
      case "week" =>
        df.withColumn("week", date_format(col("date_bin_start"), "dd MMM yy"))
      case "month" =>
        df.withColumn("month", date_format(col("date_bin_start"), "MMMM yyyy"))
          .withColumn("year", date_format(col("date_bin_start"), "yyyy"))
      case "year" =>
        df.withColumn("year", date_format(col("date_bin_start"), "yyyy"))
      case other =>
        throw new IllegalArgumentException(s"unknown grain: $other")
    }
    nBoats.fold(labelled)(n => labelled.withColumn("n_boats", lit(n)))
  }

  /** `label_taxa_groups` (`export.R:163-192`): unique taxa per fish
    * group as a sorted array — the relational form of R's named list
    * (split + as.list). */
  def labelTaxaGroups(df: DataFrame): DataFrame =
    df.select(col("fish_group").as("group"), col("catch_taxon").as("taxa"))
      .filter(col("group").isNotNull)
      .distinct()
      .groupBy(col("group"))
      .agg(array_sort(collect_set(col("taxa"))).as("taxa_list"))
}
