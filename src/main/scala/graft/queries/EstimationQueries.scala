package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.pipeline.{Estimation, MergeTrips}

/** Estimation composition under the oracle (SURVEY §3.4,
  * `R/estimate-catch.R:487-613` + `R/merge-trips.R:104-116`): q77
  * drives municipal→national rollup and the taxa-proportion
  * redistribution as one wired pipeline; q78 the merge-trips catch
  * composition (no-catch deterministic sample).
  */
object EstimationQueries {

  private val dsumSql = (x: String) => s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"
  private val davgSql = (x: String) => s"(${dsumSql(x)} / COUNT($x))"
  // R sum() without na.rm: any null -> null, empty -> 0
  private val rsumSql = (x: String) =>
    s"CASE WHEN COUNT($x) = COUNT(*) THEN COALESCE(${dsumSql(x)}, 0.0) END"
  /** 6-decimal floor-scale quantizer (pure IEEE, engine-identical). */
  private def q6(c: org.apache.spark.sql.Column) =
    floor(c * 1e6 + 0.5) / 1e6
  private val q6Sql = (x: String) => s"floor(($x) * 1e6 + 0.5) / 1e6"

  /** Municipal aggregated model frame: (municipality, period, month,
    * landing_period, metrics…). */
  def fixtureMunicipalAgg(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    orders(s, d).groupBy(
        concat(lit("M"), (col("o_custkey") % 5).cast("string")).as("municipality"),
        to_date(date_trunc("month", col("o_orderdate"))).as("landing_period"))
      .agg(
        // model outputs quantized to 6 decimals (floor-scale, IEEE-
        // deterministic): a mean has arbitrary decimals and the national
        // rollup's DECIMAL(38,6) route would round its 7th decimal
        // differently per engine
        q6(davg((k % 200).cast("double") * 0.25)).as("landing_catch_price"),
        q6(davg((k % 50).cast("double") * 0.5)).as("n_landings_per_boat"),
        q6(davg((k % 500).cast("double") * 0.5)).as("landing_catch"),
        dsum((k % 80).cast("double") * 0.25).as("catch_price"),
        dsum((k % 100).cast("double") * 0.5).as("catch"),
        q6(davg((k % 60).cast("double") * 0.125)).as("price_kg"))
      .withColumn("period",
        concat(year(col("landing_period")).cast("string"), lit("-"),
          month(col("landing_period")).cast("string")))
      .withColumn("month", month(col("landing_period")))
  }

  /** Municipal taxa frame, with a deterministic null patch on one
    * municipality's March catches to exercise R's null-propagating
    * taxa sums all the way through the proportion denominator. */
  def fixtureMunicipalTaxa(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    lineitem(s, d).join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(
        concat(lit("M"), (col("o_custkey") % 5).cast("string")).as("municipality"),
        to_date(date_trunc("month", col("o_orderdate"))).as("landing_period"),
        concat(lit("T"), (col("l_partkey") % 6).cast("string")).as("grouped_taxa"))
      .agg(
        q6(davg((k % 150).cast("double") * 0.25)).as("landing_catch_price"),
        q6(davg((k % 40).cast("double") * 0.5)).as("n_landings_per_boat"),
        q6(davg((k % 300).cast("double") * 0.5)).as("landing_catch"),
        dsum(col("l_quantity") * 0.25).as("catch_price"),
        dsum(col("l_quantity") * 0.5).as("catch"))
      .withColumn("catch",
        when(col("municipality") === "M2" && month(col("landing_period")) === 3,
          lit(null)).otherwise(col("catch")))
      .withColumn("period",
        concat(year(col("landing_period")).cast("string"), lit("-"),
          month(col("landing_period")).cast("string")))
      .withColumn("month", month(col("landing_period")))
  }

  val q77 = GQuery(
    "q77_national_estimates",
    (s, d) => {
      val natAgg = Estimation.nationalAggregated(fixtureMunicipalAgg(s, d))
      val natTaxa = Estimation.nationalTaxa(fixtureMunicipalTaxa(s, d))
      Estimation.taxaProportion(natAgg, natTaxa)
        .select(col("landing_period"), col("grouped_taxa"),
          floor(col("landing_catch_price") * 1e6 + 0.5).cast("long").as("lcp_e6"),
          floor(col("n_landings_per_boat") * 1e6 + 0.5).cast("long").as("nlb_e6"),
          floor(col("landing_catch") * 1e6 + 0.5).cast("long").as("lc_e6"),
          floor(col("catch_price") * 100.0 + 0.5).cast("long").as("cp_e2"),
          floor(col("catch") * 1e6 + 0.5).cast("long").as("catch_e6"))
    },
    Some(s"""WITH magg AS (
      |  SELECT 'M' || CAST(o_custkey % 5 AS VARCHAR) AS municipality,
      |    CAST(date_trunc('month', o_orderdate) AS DATE) AS lp,
      |    ${q6Sql(davgSql("CAST(o_orderkey % 200 AS DOUBLE) * 0.25"))} AS lcp,
      |    ${q6Sql(davgSql("CAST(o_orderkey % 50 AS DOUBLE) * 0.5"))} AS nlb,
      |    ${q6Sql(davgSql("CAST(o_orderkey % 500 AS DOUBLE) * 0.5"))} AS lc,
      |    ${dsumSql("CAST(o_orderkey % 80 AS DOUBLE) * 0.25")} AS cp,
      |    ${dsumSql("CAST(o_orderkey % 100 AS DOUBLE) * 0.5")} AS c,
      |    ${q6Sql(davgSql("CAST(o_orderkey % 60 AS DOUBLE) * 0.125"))} AS pk
      |  FROM orders GROUP BY 1, 2),
      |nat AS (
      |  SELECT lp,
      |    ${davgSql("lcp")} AS lcp, ${davgSql("nlb")} AS nlb, ${davgSql("lc")} AS lc,
      |    COALESCE(${dsumSql("cp")}, 0.0) AS cp, COALESCE(${dsumSql("c")}, 0.0) AS tot_catch,
      |    quantile_cont(pk, 0.5) AS pk
      |  FROM magg GROUP BY lp),
      |mtaxa AS (
      |  SELECT 'M' || CAST(o_custkey % 5 AS VARCHAR) AS municipality,
      |    CAST(date_trunc('month', o_orderdate) AS DATE) AS lp,
      |    'T' || CAST(l_partkey % 6 AS VARCHAR) AS grouped_taxa,
      |    ${q6Sql(davgSql("CAST(o_orderkey % 150 AS DOUBLE) * 0.25"))} AS lcp,
      |    ${q6Sql(davgSql("CAST(o_orderkey % 40 AS DOUBLE) * 0.5"))} AS nlb,
      |    ${q6Sql(davgSql("CAST(o_orderkey % 300 AS DOUBLE) * 0.5"))} AS lc,
      |    ${dsumSql("l_quantity * 0.25")} AS cp,
      |    ${dsumSql("l_quantity * 0.5")} AS c
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2, 3),
      |mtaxa2 AS (
      |  SELECT municipality, lp, grouped_taxa, lcp, nlb, lc, cp,
      |    CASE WHEN municipality = 'M2' AND month(lp) = 3 THEN NULL ELSE c END AS c
      |  FROM mtaxa),
      |ntaxa AS (
      |  SELECT lp, grouped_taxa,
      |    ${davgSql("lcp")} AS lcp, ${davgSql("nlb")} AS nlb, ${davgSql("lc")} AS lc,
      |    ${rsumSql("cp")} AS cp, ${rsumSql("c")} AS c
      |  FROM mtaxa2 GROUP BY 1, 2),
      |prop AS (
      |  SELECT lp, grouped_taxa, lcp, nlb, lc, cp,
      |    c / (CASE WHEN COUNT(c) OVER (PARTITION BY lp) = COUNT(*) OVER (PARTITION BY lp)
      |         THEN CAST(SUM(CAST(c AS DECIMAL(38,6))) OVER (PARTITION BY lp) AS DOUBLE) END)
      |      * 100.0 AS taxa_prop
      |  FROM ntaxa)
      |SELECT p.lp AS landing_period, p.grouped_taxa,
      |  CAST(floor(p.lcp * 1e6 + 0.5) AS BIGINT) AS lcp_e6,
      |  CAST(floor(p.nlb * 1e6 + 0.5) AS BIGINT) AS nlb_e6,
      |  CAST(floor(p.lc * 1e6 + 0.5) AS BIGINT) AS lc_e6,
      |  CAST(floor(p.cp * 100.0 + 0.5) AS BIGINT) AS cp_e2,
      |  CAST(floor(p.taxa_prop / 100.0 * n.tot_catch * 1e6 + 0.5) AS BIGINT) AS catch_e6
      |FROM prop p LEFT JOIN nat n ON p.lp = n.lp""".stripMargin))

  /** Exploded trip rows (species grain) for the catch composition. */
  def fixtureTripRows(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      col("l_orderkey").as("landing_id"),
      when(col("l_partkey") % 17 === 0, "0")
        .otherwise(concat(lit("T"), (col("l_partkey") % 40).cast("string"))).as("catch_taxon"),
      when(col("l_partkey") % 17 === 0, lit(0.0)).otherwise(col("l_quantity")).as("individuals"),
      col("l_extendedprice").as("weight_g"),
      concat_ws("-", col("l_partkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice")).as("row_key"))

  val q78 = GQuery(
    "q78_nocatch_compose",
    (s, d) =>
      MergeTrips.composeCatch(fixtureTripRows(s, d), "row_key")
        .groupBy((col("catch_taxon") === "0").as("is_nocatch"))
        .agg(
          lcount(lit(1)).as("n_rows"),
          countDistinct(col("landing_id")).as("n_landings"),
          lsum6(col("individuals")).as("sum_individuals"),
          dsum(col("weight_g")).as("sum_weight")),
    Some(s"""WITH rows0 AS (
      |  SELECT l_orderkey AS landing_id,
      |    CASE WHEN l_partkey % 17 = 0 THEN '0'
      |         ELSE 'T' || CAST(l_partkey % 40 AS VARCHAR) END AS catch_taxon,
      |    CASE WHEN l_partkey % 17 = 0 THEN 0.0 ELSE l_quantity END AS individuals,
      |    l_extendedprice AS weight_g,
      |    CAST(l_partkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
      |      || '-' || CAST(l_quantity AS VARCHAR) || '-' || CAST(l_extendedprice AS VARCHAR) AS row_key
      |  FROM lineitem),
      |catches AS (SELECT * FROM rows0 WHERE individuals > 0),
      |nocatch AS (
      |  SELECT landing_id,
      |    arg_min(catch_taxon, md5(CAST(landing_id AS VARCHAR) || ' ' || row_key)) AS catch_taxon,
      |    arg_min(individuals, md5(CAST(landing_id AS VARCHAR) || ' ' || row_key)) AS individuals,
      |    arg_min(weight_g, md5(CAST(landing_id AS VARCHAR) || ' ' || row_key)) AS weight_g
      |  FROM rows0 WHERE catch_taxon = '0' GROUP BY landing_id),
      |composed AS (
      |  SELECT landing_id, catch_taxon, individuals, weight_g FROM catches
      |  UNION ALL
      |  SELECT landing_id, catch_taxon, individuals, weight_g FROM nocatch)
      |SELECT catch_taxon = '0' AS is_nocatch, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT landing_id) AS n_landings,
      |  ${sqlLsum6("individuals")} AS sum_individuals,
      |  ${dsumSql("weight_g")} AS sum_weight
      |FROM composed GROUP BY 1""".stripMargin))

  def queries: Seq[GQuery] = Seq(q77, q78)
}
