package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.pipeline.Nutrients

/** The nutrient surface under the oracle (SURVEY §3.4 tail,
  * `R/calculate-nutrients.R` + `R/format-public-data.R:597-611,
  * 1177-1205`): q74 drives taxon nutrient-table construction (dedup,
  * FAO replacement, FLY override, unit conversion, per-code medians,
  * NA backfill), catch→nutrient-mass conversion and RDI scaling.
  *
  * Fixture taxa derive deterministically from `part`/`lineitem`; the
  * FAO composition frame from `nation`. All arithmetic is pure IEEE
  * double with identical formulas in both engines (every fractional
  * fixture constant is an exact binary fraction, and the oracle casts
  * to DOUBLE before any arithmetic so DuckDB's DECIMAL literals can't
  * diverge); outputs are floor-scaled fixed-point (`floor(x·1eN+0.5)`)
  * because engine `round()` implementations disagree on
  * just-off-half doubles.
  */
object NutrientQueries {

  /** Deterministic taxon code: invertebrate codes (FAO-sourced), the
    * FLY override, and generic ICn fish codes. */
  private def codeOf(k: org.apache.spark.sql.Column) =
    when(k % 12 === 0, "OCT").when(k % 12 === 1, "SQZ")
      .when(k % 12 === 2, "CLV").when(k % 12 === 3, "CSH")
      .when(k % 12 === 4, "CRB").when(k % 12 === 5, "FLY")
      .otherwise(concat(lit("IC"), (k % 12).cast("string")))

  private val codeSql =
    """CASE %1$s %% 12 WHEN 0 THEN 'OCT' WHEN 1 THEN 'SQZ' WHEN 2 THEN 'CLV'
      | WHEN 3 THEN 'CSH' WHEN 4 THEN 'CRB' WHEN 5 THEN 'FLY'
      | ELSE 'IC' || CAST(%1$s %% 12 AS VARCHAR) END""".stripMargin.replace("\n", "")

  /** FishBase-like species estimates from `part` (VitaminA nulls
    * exercise na.omit; duplicated (code, spec) keys exercise the
    * ordered dedup). */
  def fixtureFish(s: SparkSession, d: String): DataFrame = {
    val k = col("p_partkey")
    part(s, d).select(
      codeOf(k).as("interagency_code"),
      (k % 5).as("SpecCode"),
      ((k % 97) + 0.5).as("Selenium"),
      ((k % 23) * 0.5).as("Zinc"),
      ((k % 40) + 1.0).as("Protein"),
      ((k % 9) * 0.25).as("Omega3"),
      ((k % 400) + 10.0).as("Calcium"),
      ((k % 13) * 0.25).as("Iron"),
      when(k % 17 === 0, lit(null).cast("double"))
        .otherwise((k % 55) + 2.0).as("VitaminA"),
      k.as("ord"))
  }

  /** FAO composition rows from `nation` (one Vitamin_A_mu null
    * exercises the global-median backfill). */
  def fixtureFao(s: SparkSession, d: String): DataFrame = {
    val n = col("n_nationkey")
    nation(s, d).filter(n < 4).select(
      when(n === 0, "OCT").when(n === 1, "SQZ")
        .when(n === 2, "CLV").otherwise("CSH").as("interagency_code"),
      (lit(30.0) + n * 2.0).as("Selenium_mu"),
      (lit(1.0) + n * 0.5).as("Zinc_mu"),
      (lit(15.0) + n * 1.0).as("Protein_mu"),
      (lit(0.25) + n * 0.125).as("Omega_3_mu"),
      (lit(300.0) + n * 10.0).as("Calcium_mu"),
      (lit(2.0) + n * 0.25).as("Iron_mu"),
      when(n === 1, lit(null).cast("double"))
        .otherwise(lit(20.0) + n * 1.0).as("Vitamin_A_mu"))
  }

  /** Monthly catch (kg) per taxon from `lineitem` (exact scaled-long
    * quantity sums). */
  def fixtureTaxaEstimations(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy(
        date_trunc("month", col("l_shipdate")).cast("date").as("date_bin_start"),
        codeOf(col("l_partkey")).as("grouped_taxa"))
      .agg((lsum6(col("l_quantity")) / 100.0).as("catch"))

  /** Shared oracle prefix: fixture frames → nutrient table → wide
    * per-(month, taxon) nutrient masses. q74 chains RDI scaling onto
    * it; q81 chains the proportions/backfill/aggregate tail. */
  private val wideSql = s"""fish AS (
      |  SELECT ${codeSql.format("p_partkey")} AS interagency_code,
      |    p_partkey % 5 AS spec,
      |    CAST((p_partkey % 97) + 0.5 AS DOUBLE) AS se, CAST((p_partkey % 23) * 0.5 AS DOUBLE) AS zn,
      |    CAST((p_partkey % 40) + 1.0 AS DOUBLE) AS pr, CAST((p_partkey % 9) * 0.25 AS DOUBLE) AS om,
      |    CAST((p_partkey % 400) + 10.0 AS DOUBLE) AS ca, CAST((p_partkey % 13) * 0.25 AS DOUBLE) AS fe,
      |    CASE WHEN p_partkey % 17 = 0 THEN NULL
      |         ELSE CAST((p_partkey % 55) + 2.0 AS DOUBLE) END AS va,
      |    p_partkey AS ord
      |  FROM part),
      |dedup AS (
      |  SELECT interagency_code,
      |    arg_min(se, ord) AS Selenium_mu, arg_min(zn, ord) AS Zinc_mu,
      |    arg_min(pr, ord) AS Protein_mu, arg_min(om, ord) AS Omega_3_mu,
      |    arg_min(ca, ord) AS Calcium_mu, arg_min(fe, ord) AS Iron_mu,
      |    arg_min(va, ord) AS Vitamin_A_mu
      |  FROM fish WHERE va IS NOT NULL
      |  GROUP BY interagency_code, spec),
      |fao AS (
      |  SELECT CASE n_nationkey WHEN 0 THEN 'OCT' WHEN 1 THEN 'SQZ'
      |           WHEN 2 THEN 'CLV' ELSE 'CSH' END AS interagency_code,
      |    CAST(30.0 + n_nationkey * 2.0 AS DOUBLE) AS Selenium_mu,
      |    CAST(1.0 + n_nationkey * 0.5 AS DOUBLE) AS Zinc_mu,
      |    CAST(15.0 + n_nationkey * 1.0 AS DOUBLE) AS Protein_mu,
      |    CAST(0.25 + n_nationkey * 0.125 AS DOUBLE) AS Omega_3_mu,
      |    CAST(300.0 + n_nationkey * 10.0 AS DOUBLE) AS Calcium_mu,
      |    CAST(2.0 + n_nationkey * 0.25 AS DOUBLE) AS Iron_mu,
      |    CASE WHEN n_nationkey = 1 THEN NULL
      |         ELSE CAST(20.0 + n_nationkey * 1.0 AS DOUBLE) END AS Vitamin_A_mu
      |  FROM nation WHERE n_nationkey < 4),
      |merged AS (
      |  SELECT * FROM dedup
      |  WHERE interagency_code NOT IN (SELECT DISTINCT interagency_code FROM fao)
      |    AND interagency_code <> 'FLY'
      |  UNION ALL SELECT * FROM fao
      |  UNION ALL SELECT 'FLY', CAST(40.6528 AS DOUBLE), CAST(1.44887 AS DOUBLE),
      |    CAST(17.09566 AS DOUBLE), CAST(0.2460711 AS DOUBLE),
      |    CAST(423.1434 AS DOUBLE), CAST(2.109762 AS DOUBLE), CAST(25.77763 AS DOUBLE)),
      |converted AS (
      |  SELECT interagency_code,
      |    CAST(Selenium_mu AS DOUBLE) / 1000000.0 / 100.0 AS Selenium_mu,
      |    CAST(Zinc_mu AS DOUBLE) / 1000.0 / 100.0 AS Zinc_mu,
      |    CAST(Protein_mu AS DOUBLE) / 100.0 AS Protein_mu,
      |    CAST(Omega_3_mu AS DOUBLE) / 100.0 AS Omega_3_mu,
      |    CAST(Calcium_mu AS DOUBLE) / 1000.0 / 100.0 AS Calcium_mu,
      |    CAST(Iron_mu AS DOUBLE) / 1000.0 / 100.0 AS Iron_mu,
      |    CAST(Vitamin_A_mu AS DOUBLE) / 1000000.0 / 100.0 AS Vitamin_A_mu
      |  FROM merged),
      |med AS (
      |  SELECT interagency_code,
      |    quantile_cont(Selenium_mu, 0.5) AS Selenium_mu,
      |    quantile_cont(Zinc_mu, 0.5) AS Zinc_mu,
      |    quantile_cont(Protein_mu, 0.5) AS Protein_mu,
      |    quantile_cont(Omega_3_mu, 0.5) AS Omega_3_mu,
      |    quantile_cont(Calcium_mu, 0.5) AS Calcium_mu,
      |    quantile_cont(Iron_mu, 0.5) AS Iron_mu,
      |    quantile_cont(Vitamin_A_mu, 0.5) AS Vitamin_A_mu
      |  FROM converted GROUP BY interagency_code),
      |gmed AS (
      |  SELECT quantile_cont(Selenium_mu, 0.5) AS g_se,
      |    quantile_cont(Zinc_mu, 0.5) AS g_zn,
      |    quantile_cont(Protein_mu, 0.5) AS g_pr,
      |    quantile_cont(Omega_3_mu, 0.5) AS g_om,
      |    quantile_cont(Calcium_mu, 0.5) AS g_ca,
      |    quantile_cont(Iron_mu, 0.5) AS g_fe,
      |    quantile_cont(Vitamin_A_mu, 0.5) AS g_va
      |  FROM med),
      |nt AS (
      |  SELECT interagency_code,
      |    COALESCE(Selenium_mu, g_se) AS Selenium_mu,
      |    COALESCE(Zinc_mu, g_zn) AS Zinc_mu,
      |    COALESCE(Protein_mu, g_pr) AS Protein_mu,
      |    COALESCE(Omega_3_mu, g_om) AS Omega_3_mu,
      |    COALESCE(Calcium_mu, g_ca) AS Calcium_mu,
      |    COALESCE(Iron_mu, g_fe) AS Iron_mu,
      |    COALESCE(Vitamin_A_mu, g_va) AS Vitamin_A_mu
      |  FROM med, gmed),
      |taxa AS (
      |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS date_bin_start,
      |    ${codeSql.format("l_partkey")} AS grouped_taxa,
      |    ${sqlLsum6("l_quantity")} / 100.0 AS catch
      |  FROM lineitem
      |  GROUP BY 1, 2),
      |wide AS (
      |  SELECT t.date_bin_start, t.grouped_taxa, t.catch,
      |    n.Selenium_mu * (t.catch * 1000.0) / 1000.0 AS selenium,
      |    n.Zinc_mu * (t.catch * 1000.0) / 1000.0 AS zinc,
      |    n.Protein_mu * (t.catch * 1000.0) / 1000.0 AS protein,
      |    n.Omega_3_mu * (t.catch * 1000.0) / 1000.0 AS omega3,
      |    n.Calcium_mu * (t.catch * 1000.0) / 1000.0 AS calcium,
      |    n.Iron_mu * (t.catch * 1000.0) / 1000.0 AS iron,
      |    n.Vitamin_A_mu * (t.catch * 1000.0) / 1000.0 AS vitaminA
      |  FROM taxa t LEFT JOIN nt n ON t.grouped_taxa = n.interagency_code)""".stripMargin

  val q74 = GQuery(
    "q74_nutrient_rdi",
    (s, d) => {
      val nt = Nutrients.nutrientsTable(fixtureFish(s, d), fixtureFao(s, d), "ord")
      val wide = Nutrients.summariseNutrients(fixtureTaxaEstimations(s, d), nt)
      val long = Nutrients.toLong(wide,
        Seq("date_bin_start", "grouped_taxa", "catch"))
      // floor-scaled fixed-point at the edge: engine round() impls
      // disagree on just-off-half doubles (DuckDB's multiply-based
      // round vs Spark's BigDecimal HALF_UP), while floor(x·1eN + 0.5)
      // is pure IEEE — bit-identical wherever the doubles are
      Nutrients.periodRdi(long, unitDays = 30.0)
        .select(col("date_bin_start"), col("grouped_taxa"), col("nutrient"),
          floor(col("catch") * 100.0 + 0.5).cast("long").as("catch_e2"),
          floor(col("nut_supply") * 1e10 + 0.5).cast("long").as("supply_e10"),
          floor(col("nut_rdi") * 1e6 + 0.5).cast("long").as("rdi_e6"))
    },
    Some(s"""WITH $wideSql,
      |lng AS (
      |  SELECT date_bin_start, grouped_taxa, catch, 'selenium' AS nutrient,
      |    selenium AS nut_supply FROM wide
      |  UNION ALL SELECT date_bin_start, grouped_taxa, catch, 'zinc', zinc FROM wide
      |  UNION ALL SELECT date_bin_start, grouped_taxa, catch, 'protein', protein FROM wide
      |  UNION ALL SELECT date_bin_start, grouped_taxa, catch, 'omega3', omega3 FROM wide
      |  UNION ALL SELECT date_bin_start, grouped_taxa, catch, 'calcium', calcium FROM wide
      |  UNION ALL SELECT date_bin_start, grouped_taxa, catch, 'iron', iron FROM wide
      |  UNION ALL SELECT date_bin_start, grouped_taxa, catch, 'vitaminA', vitaminA FROM wide),
      |rdi AS (
      |  SELECT *, nut_supply * 1000.0 / 30.0 /
      |    CASE nutrient WHEN 'selenium' THEN 0.000026 WHEN 'zinc' THEN 0.0049
      |      WHEN 'protein' THEN 46.0 WHEN 'omega3' THEN 2.939
      |      WHEN 'calcium' THEN 1.0 WHEN 'iron' THEN 0.0294
      |      WHEN 'vitaminA' THEN 0.0005 END AS nut_rdi
      |  FROM lng)
      |SELECT date_bin_start, grouped_taxa, nutrient,
      |  CAST(floor(catch * 100.0 + 0.5) AS BIGINT) AS catch_e2,
      |  CAST(floor(nut_supply * 1e10 + 0.5) AS BIGINT) AS supply_e10,
      |  CAST(floor(nut_rdi * 1e6 + 0.5) AS BIGINT) AS rdi_e6
      |FROM rdi""".stripMargin))

  /** The nutrient backfill tail (`R/format-public-data.R:613-698`):
    * median nutrient-per-catch proportions → the catch-all taxon's
    * nutrients recomputed from its catch for bins at/after the cutoff
    * ('IC7' / 1995-01-01 play MZZ / 2018-04-01) → na.rm sums per date
    * bin, long. Sums at 1e12 fixed-point (nutrient masses are far
    * below the micros scale). */
  val q81 = GQuery(
    "q81_nutrient_backfill",
    (s, d) => {
      val nt = Nutrients.nutrientsTable(fixtureFish(s, d), fixtureFao(s, d), "ord")
      val wide = Nutrients.summariseNutrients(fixtureTaxaEstimations(s, d), nt)
      val props = Nutrients.nutrientProportions(wide)
      val filled = Nutrients.fillMissingGroup(wide, props,
        taxa = "IC7", since = "1995-01-01")
      Nutrients.aggregateNutrients(filled)
        .select(col("date_bin_start"), col("nutrient"),
          floor(col("nut_supply") * 1e9 + 0.5).cast("long").as("supply_e9"))
    },
    Some {
      val scale = "1000000000000.0"
      def lsumSql(c: String) =
        s"""CASE WHEN CAST(COUNT($c) AS DOUBLE) *
           | CAST(MAX(abs(CAST(floor(($c) * $scale + 0.5) AS BIGINT))) AS DOUBLE) < 9.0e18
           | THEN CAST(SUM(CAST(floor(($c) * $scale + 0.5) AS BIGINT)) AS DOUBLE) / $scale
           | END""".stripMargin.replace("\n", "")
      val nuts = Seq("selenium", "zinc", "protein", "omega3", "calcium", "iron", "vitaminA")
      s"""WITH $wideSql,
        |props AS (
        |  SELECT ${nuts.map(n => s"quantile_cont($n / catch * 100.0, 0.5) AS p_$n").mkString(", ")}
        |  FROM wide),
        |filled AS (
        |  SELECT w.date_bin_start,
        |    ${nuts.map(n =>
             s"""CASE WHEN w.grouped_taxa = 'IC7' AND w.date_bin_start >= DATE '1995-01-01'
                | THEN w.catch * p.p_$n / 100.0 ELSE w.$n END AS $n""".stripMargin.replace("\n", ""))
             .mkString(", ")}
        |  FROM wide w, props p),
        |ag AS (
        |  SELECT date_bin_start,
        |    ${nuts.map(n => s"COALESCE(${lsumSql(n)}, 0.0) AS $n").mkString(", ")}
        |  FROM filled GROUP BY date_bin_start),
        |lng AS (
        |  ${nuts.map(n =>
             s"SELECT date_bin_start, '$n' AS nutrient, $n AS nut_supply FROM ag")
             .mkString(" UNION ALL ")})
        |SELECT date_bin_start, nutrient,
        |  CAST(floor(nut_supply * 1e9 + 0.5) AS BIGINT) AS supply_e9
        |FROM lng""".stripMargin
    })

  def queries: Seq[GQuery] = Seq(q74, q81)
}
