package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Exact._

/** The portal summary blocks of `get_summary_data`
  * (`/root/reference/R/format-public-data.R:783-960`) and the taxa
  * labelling shared with the PDS export
  * (`convert_taxa_names`, `R/ingest-pds-data.R:598-692`).
  *
  * Every block is a small composition of the engine's gated kernels
  * (share-of-total, complete-grid, exact medians/means) — the value
  * here is the faithful wiring, not new operators. All aggregates are
  * exact-routed so compositions stay under the hash gate.
  */
object SummaryData {

  // --- area classification (`:784-806`) ---

  val NorthMunicipalities: Seq[String] =
    Seq("Bobonaro", "Liquica", "Dili", "Baucau", "Oecusse")
  val NorthSites: Seq[String] =
    Seq("Com", "Tutuala", "Ililai", "Sentru/Liarafa/Sika/Rau Moko", "Comando")

  /** The reference's coast split; arm order preserved (a null
    * municipality with a north-coast landing site is North Coast). */
  def areaOf(municipality: Column, landingSite: Column): Column =
    when(municipality.isin(NorthMunicipalities: _*) ||
      landingSite.isin(NorthSites: _*), "North Coast")
      .when(municipality === "Atauro", "Atauro island")
      .when(municipality.isNull, lit(null).cast("string"))
      .otherwise("South Coast")

  // --- fish-group recode (`R/ingest-pds-data.R:621-689`) ---

  /** `fish_group` case ladder, case order preserved — "SUR" appears in
    * both demersal lists and must resolve to Large demersals (first
    * match). Unlisted taxa → null (dropped by the composition). */
  def fishGroupOf(taxon: Column): Column =
    when(taxon.isin("COZ"), "Molluscs")
      .when(taxon.isin("PEZ"), "Shrimps")
      .when(taxon.isin("MZZ"), "Unknown")
      .when(taxon.isin("SLV", "CRA"), "Crustaceans")
      .when(taxon.isin("OCZ", "IAX"), "Cephalopods")
      .when(taxon.isin("SKH", "SRX"), "Sharks and rays")
      .when(taxon.isin("SNA", "GPX", "PWT", "SUR", "GRX", "MUI", "BGX"),
        "Large demersals")
      .when(taxon.isin("CGX", "TUN", "BEN", "LWX", "BAR", "SFA", "CBA",
        "DOX", "ECN", "DOS"), "Large pelagics")
      .when(taxon.isin("YDX", "SPI", "EMP", "TRI", "MOJ", "WRA", "MOO",
        "BWH", "LGE", "MOB", "MHL", "GOX", "THO", "IHX", "APO", "PUX",
        "DRZ"), "Small demersals")
      .when(taxon.isin("RAX", "SDX", "CJX", "CLP", "GZP", "FLY", "KYX",
        "MUL", "DSF", "MIL", "THF"), "Small pelagics")

  // --- groups composition (`groups_comp`, `:928-953`) ---

  /** Catch contribution per fish group: share of the grand total,
    * zero-contribution groups dropped, groups under 1 % re-labelled
    * "Other" and re-aggregated, catch reported as truncated millions
    * (R `as.integer`), descending. `rows`: (catch_taxon, catch).
    * Two exact aggregations + one broadcast scalar — no window over
    * the full data. */
  def groupsComposition(rows: DataFrame): DataFrame = {
    val labelled = rows
      .withColumn("fish_group", fishGroupOf(col("catch_taxon")))
      .filter(col("fish_group").isNotNull)
    val grouped = labelled
      .groupBy(col("fish_group"))
      .agg(sum(col("catch").cast(graft.core.Exact.Dec)).as("__cd"))
    // the grand total folds the per-group DECIMAL sums inside a window
    // over the GROUPED frame (≤ the taxonomy's group count at any data
    // scale): exact and associative, so bit-equal to summing the rows —
    // and the fact table is scanned exactly once
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val perGroup = grouped
      .withColumn("__tot", sum(col("__cd")).over(w).cast("double"))
      .withColumn("__c", coalesce(col("__cd").cast("double"), lit(0.0)))
      .drop("__cd")
      .withColumn("__contr", col("__c") / col("__tot") * 100.0)
      .filter(col("__contr") =!= 0.0)
      .withColumn("fish_group",
        when(col("__contr") < 1.0, lit("Other")).otherwise(col("fish_group")))
    perGroup
      .groupBy(col("fish_group"))
      .agg(floor(coalesce(dsum(col("__c")), lit(0.0)) / 1000000.0).cast("long").as("catch"))
      .orderBy(col("catch").desc, col("fish_group"))
  }

  // --- conservation shares (`:842-861`) ---

  /** Per-municipality preservation-method percentages over the grid of
    * OBSERVED (municipality, method) values, absent cells zero-filled
    * (tidyr::complete + replace_na). `trips`: (municipality,
    * catch_preservation). */
  def conservationShares(trips: DataFrame): DataFrame = {
    val obs = trips.filter(col("catch_preservation").isNotNull)
      .select(col("municipality"), col("catch_preservation"))
    val counts = obs.groupBy(col("municipality"), col("catch_preservation"))
      .agg(count(lit(1)).as("count"))
    val nObs = obs.groupBy(col("municipality")).agg(count(lit(1)).as("__n_obs"))
    val withPerc = counts.join(nObs, Seq("municipality"))
      .withColumn("perc", col("count") / col("__n_obs") * 100.0)
      .drop("__n_obs")
    val grid = obs.select(col("municipality")).distinct()
      .crossJoin(obs.select(col("catch_preservation")).distinct())
    grid.join(withPerc, Seq("municipality", "catch_preservation"), "left")
      .na.fill(0L, Seq("count")).na.fill(0.0, Seq("perc"))
  }

  // --- happiness monthly means (`:833-841`) ---

  def happinessMonthly(trips: DataFrame): DataFrame =
    trips
      .groupBy(col("municipality"),
        to_date(date_trunc("month", col("landing_date"))).as("landing_date"))
      .agg(davg(col("happiness")).as("happiness"))

  // --- nutrients-per-catch averages (`:808-831`) ---

  /** Per-trip na.rm sums of the 7 `_mu` columns, trips with zero zinc
    * dropped, grand means, RDI division, long form, `_mu` rows removed,
    * descending by the RDI equivalent. `catchRows`: (trip_id, *_mu). */
  def nutrientsCatchAverage(catchRows: DataFrame): DataFrame = {
    val mus = Nutrients.Table.map(_._1)
    val perTrip = catchRows.groupBy(col("trip_id"))
      .agg(
        coalesce(dsum(col(mus.head)), lit(0.0)).as(mus.head),
        mus.tail.map(c => coalesce(dsum(col(c)), lit(0.0)).as(c)): _*)
      .filter(col("Zinc_mu") =!= 0.0)
    val means = perTrip.agg(
      davg(col(mus.head)).as(mus.head),
      mus.tail.map(c => davg(col(c)).as(c)): _*)
    val longPairs = Nutrients.Table.flatMap { case (mu, _, rdi) =>
      val label = mu match {
        case "Omega_3_mu"   => "Omega-3"
        case "Vitamin_A_mu" => "Vitamin A"
        case m              => m.stripSuffix("_mu")
      }
      Seq(lit(label), col(mu) / lit(rdi))
    }
    means
      .select(explode(map(longPairs: _*)).as(Seq("nutrient_names", "nut_rdi")))
      .orderBy(col("nut_rdi").desc, col("nutrient_names"))
  }
}
