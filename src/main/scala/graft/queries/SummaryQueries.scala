package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.pipeline.{Export, SummaryData}

/** The portal summary/export compositions under the oracle
  * (`R/format-public-data.R:783-960`, `R/export.R:93-248`): q83 the
  * fish-group catch composition with the sub-1 % "Other" bucket, q84
  * the conservation complete-grid percentages, q85 the ontology
  * renames + period labels. */
object SummaryQueries {

  private val dsumSql = (x: String) => s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"

  /** 18 taxa codes covering every fish-group arm plus two unknowns;
    * the first three codes' catches are scaled down so their groups
    * land under 1 % and re-bucket to "Other". */
  private val TaxaCodes = Seq(
    "COZ", "PEZ", "MZZ", "SLV", "OCZ", "SKH", "SNA", "GPX", "CGX",
    "TUN", "YDX", "SPI", "RAX", "CLP", "FLY", "XXX", "YYY", "SUR")

  def fixtureTaxaCatch(s: SparkSession, d: String): DataFrame = {
    val idx = (col("l_partkey") % 18).cast("int")
    lineitem(s, d).select(
      element_at(array(TaxaCodes.map(lit): _*), idx + 1).as("catch_taxon"),
      (col("l_quantity") * 100.0 *
        when(idx < 3, lit(0.02)).otherwise(lit(1.0))).as("catch"))
  }

  private val taxaCaseSql = {
    val arms = TaxaCodes.zipWithIndex
      .map { case (c, i) => s"WHEN $i THEN '$c'" }.mkString(" ")
    s"CASE l_partkey % 18 $arms END"
  }

  /** fish_group mapping as SQL (same arm order as
    * [[SummaryData.fishGroupOf]]). */
  private val groupCaseSql =
    """CASE WHEN catch_taxon IN ('COZ') THEN 'Molluscs'
      | WHEN catch_taxon IN ('PEZ') THEN 'Shrimps'
      | WHEN catch_taxon IN ('MZZ') THEN 'Unknown'
      | WHEN catch_taxon IN ('SLV','CRA') THEN 'Crustaceans'
      | WHEN catch_taxon IN ('OCZ','IAX') THEN 'Cephalopods'
      | WHEN catch_taxon IN ('SKH','SRX') THEN 'Sharks and rays'
      | WHEN catch_taxon IN ('SNA','GPX','PWT','SUR','GRX','MUI','BGX') THEN 'Large demersals'
      | WHEN catch_taxon IN ('CGX','TUN','BEN','LWX','BAR','SFA','CBA','DOX','ECN','DOS') THEN 'Large pelagics'
      | WHEN catch_taxon IN ('YDX','SPI','EMP','TRI','MOJ','WRA','MOO','BWH','LGE','MOB','MHL','GOX','THO','IHX','APO','PUX','DRZ') THEN 'Small demersals'
      | WHEN catch_taxon IN ('RAX','SDX','CJX','CLP','GZP','FLY','KYX','MUL','DSF','MIL','THF') THEN 'Small pelagics'
      | END""".stripMargin.replace("\n", "")

  val q83 = GQuery(
    "q83_groups_comp",
    (s, d) => SummaryData.groupsComposition(fixtureTaxaCatch(s, d)),
    Some(s"""WITH rows_ AS (
      |  SELECT $taxaCaseSql AS catch_taxon,
      |    l_quantity * 100.0 *
      |      (CASE WHEN l_partkey % 18 < 3 THEN 0.02 ELSE 1.0 END) AS catch
      |  FROM lineitem),
      |labelled AS (
      |  SELECT $groupCaseSql AS fish_group, catch
      |  FROM rows_ WHERE $groupCaseSql IS NOT NULL),
      |tot AS (SELECT COALESCE(${dsumSql("catch")}, 0.0) AS t FROM labelled),
      |per AS (
      |  SELECT fish_group, COALESCE(${dsumSql("catch")}, 0.0) AS c
      |  FROM labelled GROUP BY fish_group),
      |bucketed AS (
      |  SELECT CASE WHEN c / t.t * 100.0 < 1.0 THEN 'Other' ELSE fish_group END AS fish_group, c
      |  FROM per, tot t WHERE c / t.t * 100.0 <> 0.0)
      |SELECT fish_group,
      |  CAST(floor(COALESCE(${dsumSql("c")}, 0.0) / 1000000.0) AS BIGINT) AS catch
      |FROM bucketed GROUP BY fish_group""".stripMargin))

  def fixtureConservation(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    val m = concat(lit("M"), (col("o_custkey") % 5).cast("string"))
    orders(s, d).select(
      m.as("municipality"),
      when(k % 31 === 0, lit(null).cast("string"))
        .when(col("o_custkey") % 5 === 4 && k % 4 === 3, lit("P0"))
        .otherwise(concat(lit("P"), (k % 4).cast("string"))).as("catch_preservation"))
  }

  val q84 = GQuery(
    "q84_conservation_complete",
    (s, d) =>
      SummaryData.conservationShares(fixtureConservation(s, d))
        .select(col("municipality"), col("catch_preservation"), col("count"),
          floor(col("perc") * 1e6 + 0.5).cast("long").as("perc_e6")),
    Some("""WITH t AS (
      |  SELECT 'M' || CAST(o_custkey % 5 AS VARCHAR) AS municipality,
      |    CASE WHEN o_orderkey % 31 = 0 THEN NULL
      |         WHEN o_custkey % 5 = 4 AND o_orderkey % 4 = 3 THEN 'P0'
      |         ELSE 'P' || CAST(o_orderkey % 4 AS VARCHAR) END AS catch_preservation
      |  FROM orders),
      |obs AS (SELECT * FROM t WHERE catch_preservation IS NOT NULL),
      |counts AS (
      |  SELECT municipality, catch_preservation, COUNT(*) AS count
      |  FROM obs GROUP BY 1, 2),
      |nobs AS (SELECT municipality, COUNT(*) AS n FROM obs GROUP BY 1),
      |withperc AS (
      |  SELECT c.municipality, c.catch_preservation, c.count,
      |    c.count * 1.0 / n.n * 100.0 AS perc
      |  FROM counts c JOIN nobs n ON c.municipality = n.municipality),
      |grid AS (
      |  SELECT m.municipality, p.catch_preservation
      |  FROM (SELECT DISTINCT municipality FROM obs) m
      |  CROSS JOIN (SELECT DISTINCT catch_preservation FROM obs) p)
      |SELECT g.municipality, g.catch_preservation,
      |  COALESCE(w.count, 0) AS count,
      |  CAST(floor(COALESCE(w.perc, 0.0) * 1e6 + 0.5) AS BIGINT) AS perc_e6
      |FROM grid g LEFT JOIN withperc w
      |  ON g.municipality = w.municipality
      | AND g.catch_preservation = w.catch_preservation""".stripMargin))

  def fixtureMonthly(s: SparkSession, d: String): DataFrame =
    orders(s, d).groupBy(
        concat(lit("M"), (col("o_custkey") % 5).cast("string")).as("municipality"),
        to_date(date_trunc("month", col("o_orderdate"))).as("date_bin_start"))
      .agg(
        dsum(col("o_totalprice") * 0.25).as("catch_price"),
        dsum(col("o_totalprice") * 0.5).as("landing_catch"),
        min(col("o_orderpriority")).as("catch_preservation"),
        min(col("o_orderstatus")).as("propulsion_gear"))

  val q85 = GQuery(
    "q85_export_labels",
    (s, d) => {
      val out = Export.aggregatedLabels(
        Export.renameOntology(fixtureMonthly(s, d)), "month", nBoats = Some(777L))
      out.select(col("region"), col("month"), col("year"), col("n_boats"),
        floor(col("revenue") * 100.0 + 0.5).cast("long").as("revenue_e2"),
        floor(col("landing_weight") * 100.0 + 0.5).cast("long").as("weight_e2"),
        col("conservation_place"), col("propulsion_gear_type"))
    },
    Some("""SELECT 'M' || CAST(o_custkey % 5 AS VARCHAR) AS region,
      |  strftime(date_trunc('month', o_orderdate), '%B %Y') AS month,
      |  strftime(date_trunc('month', o_orderdate), '%Y') AS year,
      |  CAST(777 AS BIGINT) AS n_boats,
      |  CAST(floor(CAST(SUM(CAST((o_totalprice * 0.25) AS DECIMAL(38,6))) AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS revenue_e2,
      |  CAST(floor(CAST(SUM(CAST((o_totalprice * 0.5) AS DECIMAL(38,6))) AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS weight_e2,
      |  MIN(o_orderpriority) AS conservation_place,
      |  MIN(o_orderstatus) AS propulsion_gear_type
      |FROM orders GROUP BY 1, 2, 3""".stripMargin))

  /** Three Kobo survey generations with drifted columns (fuel under
    * two names, habitat under three, the no-fishing reason as coded +
    * free-text) — the merge-landings fixture. */
  def fixtureGenerations(s: SparkSession, d: String): (DataFrame, DataFrame, DataFrame) = {
    val k = col("o_orderkey")
    val v1 = orders(s, d).filter(k % 3 === 0).select(
      k.as("submission_id"),
      (k % 40).cast("double").as("trip_group/fuel_used_L"),
      concat(lit("H"), (k % 5).cast("string")).as("trip_group/Habitat_no_boat"),
      when(k % 7 === 0, lit("seluk__hakerek"))
        .otherwise(concat(lit("r"), (k % 4).cast("string")))
        .as("Tanba_sa_la_iha_ro_o_peskador_"),
      when(k % 7 === 0, lit("free text")).as("Seluk_hakerek_manualmente"),
      lit(null).cast("string").as("_bamboo_dataset_id"))
    val v2 = orders(s, d).filter(k % 3 === 1).select(
      k.as("submission_id"),
      (k % 50).cast("double").as("trip_group/Total_litru_mina_hir_e_ebe_gastu_ba_peska"),
      concat(lit("G"), (k % 5).cast("string")).as("trip_group/habitat_no_boat"),
      when(k % 11 === 0, (k % 2).cast("string")).as("reason_for_zero_boats"))
    val v3 = orders(s, d).filter(k % 3 === 2).select(
      k.as("submission_id"),
      (k % 60).cast("double").as("trip_group/Total_litru_mina_hir_e_ebe_gastu_ba_peska"),
      concat(lit("B"), (k % 5).cast("string")).as("trip_group/habitat_boat"))
    (v1, v2, v3)
  }

  /** q86: merge_landings — version tag + union-by-name (missing→null)
    * + the cross-generation column unification. Census per version over
    * the unified columns. */
  val q86 = GQuery(
    "q86_merge_versions",
    (s, d) => {
      val (v1, v2, v3) = fixtureGenerations(s, d)
      graft.pipeline.MergeLandings
        .mergeVersions(graft.pipeline.MergeLandings.tagAndUnion(v1, v2, v3))
        .groupBy(col("survey_version"))
        .agg(
          lcount(lit(1)).as("n_rows"),
          dsum(col("fuel_L")).as("sum_fuel"),
          countDistinct(col("`trip_group/habitat`")).as("n_habitats"),
          lcount(col("reason_no_activity")).as("n_reasons"),
          countDistinct(col("reason_no_activity")).as("n_reason_values"))
    },
    Some(s"""WITH v1 AS (
      |  SELECT o_orderkey AS sid, 'v1' AS survey_version,
      |    CAST(o_orderkey % 40 AS DOUBLE) AS fuel_old,
      |    CAST(NULL AS DOUBLE) AS fuel_new,
      |    CAST(NULL AS VARCHAR) AS hab_boat,
      |    CAST(NULL AS VARCHAR) AS hab_nb_lower,
      |    'H' || CAST(o_orderkey % 5 AS VARCHAR) AS hab_nb_upper,
      |    CASE WHEN o_orderkey % 7 = 0 THEN 'seluk__hakerek'
      |         ELSE 'r' || CAST(o_orderkey % 4 AS VARCHAR) END AS tanba,
      |    CASE WHEN o_orderkey % 7 = 0 THEN 'free text' END AS seluk,
      |    CAST(NULL AS VARCHAR) AS zero_boats
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |v2 AS (
      |  SELECT o_orderkey AS sid, 'v2' AS survey_version,
      |    CAST(NULL AS DOUBLE) AS fuel_old,
      |    CAST(o_orderkey % 50 AS DOUBLE) AS fuel_new,
      |    CAST(NULL AS VARCHAR) AS hab_boat,
      |    'G' || CAST(o_orderkey % 5 AS VARCHAR) AS hab_nb_lower,
      |    CAST(NULL AS VARCHAR) AS hab_nb_upper,
      |    CAST(NULL AS VARCHAR) AS tanba, CAST(NULL AS VARCHAR) AS seluk,
      |    CASE WHEN o_orderkey % 11 = 0 THEN CAST(o_orderkey % 2 AS VARCHAR) END AS zero_boats
      |  FROM orders WHERE o_orderkey % 3 = 1),
      |v3 AS (
      |  SELECT o_orderkey AS sid, 'v3' AS survey_version,
      |    CAST(NULL AS DOUBLE) AS fuel_old,
      |    CAST(o_orderkey % 60 AS DOUBLE) AS fuel_new,
      |    'B' || CAST(o_orderkey % 5 AS VARCHAR) AS hab_boat,
      |    CAST(NULL AS VARCHAR) AS hab_nb_lower,
      |    CAST(NULL AS VARCHAR) AS hab_nb_upper,
      |    CAST(NULL AS VARCHAR) AS tanba, CAST(NULL AS VARCHAR) AS seluk,
      |    CAST(NULL AS VARCHAR) AS zero_boats
      |  FROM orders WHERE o_orderkey % 3 = 2),
      |unioned AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3),
      |merged AS (
      |  SELECT survey_version,
      |    COALESCE(fuel_new, fuel_old) AS fuel_L,
      |    COALESCE(hab_boat,
      |      substr(COALESCE(hab_nb_lower, hab_nb_upper), 1, 1)) AS habitat,
      |    COALESCE(zero_boats,
      |      CASE WHEN tanba = 'seluk__hakerek' THEN seluk ELSE tanba END) AS reason_no_activity
      |  FROM unioned)
      |SELECT survey_version, COUNT(*) AS n_rows,
      |  ${dsumSql("fuel_L")} AS sum_fuel,
      |  COUNT(DISTINCT habitat) AS n_habitats,
      |  COUNT(reason_no_activity) AS n_reasons,
      |  COUNT(DISTINCT reason_no_activity) AS n_reason_values
      |FROM merged GROUP BY 1""".stripMargin))

  /** q87: clean_catches' schema normalization — three form-version
    * prefix families coalesced column-wise in prefix order, plus the
    * food-or-sale recode (`nain_rua` → "both"). The fixture puts each
    * submission's values under exactly one version's prefix (as real
    * form revisions do) with overlapping nulls exercising the coalesce
    * order. */
  val q87 = GQuery(
    "q87_prefix_families",
    (s, d) => {
      val k = col("o_orderkey")
      def vcase(version: Int, c: org.apache.spark.sql.Column) =
        when(k % 3 === version, c)
      val wide = orders(s, d).select(
        k.as("submission_id"),
        vcase(0, (k % 40).cast("string")).as("Spp.species"),
        vcase(0, when(k % 5 === 0, lit("nain_rua")).otherwise(lit("food")))
          .as("Spp.food_or_sale"),
        vcase(1, (k % 41).cast("string")).as("Species.species"),
        vcase(1, lit("sale")).as("Species.food_or_sale"),
        vcase(2, (k % 42).cast("string")).as("Species/species"),
        vcase(2, when(k % 7 === 0, lit("nain_rua")).otherwise(lit("food")))
          .as("Species/food_or_sale"))
      val merged = graft.operators.Harmonize.coalescePrefixFamilies(
        wide, Seq("Spp.", "Species.", "Species/"))
      merged
        .withColumn("food_or_sale",
          graft.operators.Harmonize.recode(col("food_or_sale"),
            Map("nain_rua" -> "both")))
        .groupBy(col("food_or_sale"))
        .agg(
          lcount(lit(1)).as("n_rows"),
          countDistinct(col("species")).as("n_species"),
          lcount(col("species")).as("n_species_rows"))
    },
    Some("""WITH wide AS (
      |  SELECT o_orderkey AS sid,
      |    CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_orderkey % 40 AS VARCHAR) END AS sp0,
      |    CASE WHEN o_orderkey % 3 = 0 THEN
      |      (CASE WHEN o_orderkey % 5 = 0 THEN 'nain_rua' ELSE 'food' END) END AS fs0,
      |    CASE WHEN o_orderkey % 3 = 1 THEN CAST(o_orderkey % 41 AS VARCHAR) END AS sp1,
      |    CASE WHEN o_orderkey % 3 = 1 THEN 'sale' END AS fs1,
      |    CASE WHEN o_orderkey % 3 = 2 THEN CAST(o_orderkey % 42 AS VARCHAR) END AS sp2,
      |    CASE WHEN o_orderkey % 3 = 2 THEN
      |      (CASE WHEN o_orderkey % 7 = 0 THEN 'nain_rua' ELSE 'food' END) END AS fs2
      |  FROM orders),
      |merged AS (
      |  SELECT sid, COALESCE(sp0, sp1, sp2) AS species,
      |    CASE WHEN COALESCE(fs0, fs1, fs2) = 'nain_rua' THEN 'both'
      |         ELSE COALESCE(fs0, fs1, fs2) END AS food_or_sale
      |  FROM wide)
      |SELECT food_or_sale, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT species) AS n_species,
      |  COUNT(species) AS n_species_rows
      |FROM merged GROUP BY 1""".stripMargin))

  def queries: Seq[GQuery] = Seq(q83, q84, q85, q86, q87)
}
