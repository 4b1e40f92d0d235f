package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.pipeline.PublicData

/** The format-public-data composition under the oracle (SURVEY §3.3
  * tail): q75 gates the municipal split (model frame ⋈ recorded
  * activity with zero-nulling, `R/format-public-data.R:64-159`); q76
  * gates the estimation rollups with current-period proration
  * (`:459-595`) at the month and year grains in one stacked frame.
  *
  * All means/sums are decimal-routed (davg/dsum ≡ the SQL decimal
  * mirror) and outputs floor-scaled fixed-point — see NutrientQueries
  * for why engine round() is avoided at the edge. */
object PublicDataQueries {

  private val dsumSql = (x: String) => s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"
  private val davgSql = (x: String) => s"(${dsumSql(x)} / COUNT($x))"

  /** Landing-grain municipal fixture from `orders`: municipality M0–M4
    * by customer; M4's prices are all zero (exercises the zero→NA
    * nulling at the group level); fuel nulls sprinkled. */
  def fixtureLandings(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    orders(s, d).select(
      k.as("landing_id"),
      concat(lit("M"), (col("o_custkey") % 5).cast("string")).as("municipality"),
      to_date(col("o_orderdate")).as("landing_date"),
      when(col("o_custkey") % 5 === 4, lit(0.0))
        .otherwise((k % 300).cast("double") * 0.5).as("catch_price"),
      when(k % 3 === 0, lit(null).cast("double"))
        .otherwise((k % 20).cast("double")).as("fuel"))
  }

  def fixtureCatchRows(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      col("l_orderkey").as("landing_id"),
      (col("l_quantity") * 10.0).as("catch"))

  /** Municipal model estimates: one row per (municipality, month). */
  def fixtureMunicipalModels(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    orders(s, d).groupBy(
        concat(lit("M"), (col("o_custkey") % 5).cast("string")).as("municipality"),
        to_date(date_trunc("month", col("o_orderdate"))).as("landing_period"))
      .agg(
        dsum((k % 1000).cast("double") * 0.125).as("catch"),
        dsum((k % 700).cast("double") * 0.25).as("catch_price"))
  }

  val q75 = GQuery(
    "q75_municipal_split",
    (s, d) => {
      val out = PublicData.municipalAggregated(
        fixtureMunicipalModels(s, d),
        PublicData.municipalRecorded(fixtureLandings(s, d), fixtureCatchRows(s, d)))
      out.select(col("municipality"), col("date_bin_start"),
        floor(col("catch") * 100.0 + 0.5).cast("long").as("catch_e2"),
        floor(col("catch_price") * 100.0 + 0.5).cast("long").as("model_price_e2"),
        floor(col("recorded_catch_price") * 100.0 + 0.5).cast("long").as("rec_price_e2"),
        floor(col("recorded_catch") * 1e6 + 0.5).cast("long").as("rec_catch_e6"),
        floor(col("fuel") * 1e6 + 0.5).cast("long").as("fuel_e6"))
    },
    Some(s"""WITH landing AS (
      |  SELECT o_orderkey AS lid,
      |    'M' || CAST(o_custkey % 5 AS VARCHAR) AS municipality,
      |    CAST(date_trunc('month', o_orderdate) AS DATE) AS dbs,
      |    CASE WHEN o_custkey % 5 = 4 THEN 0.0
      |         ELSE CAST(o_orderkey % 300 AS DOUBLE) * 0.5 END AS catch_price,
      |    CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |         ELSE CAST(o_orderkey % 20 AS DOUBLE) END AS fuel
      |  FROM orders),
      |lcatch AS (
      |  SELECT l_orderkey AS lid,
      |    COALESCE(${dsumSql("l_quantity * 10.0")}, 0.0) AS c
      |  FROM lineitem GROUP BY l_orderkey),
      |per AS (
      |  SELECT l.*, lc.c FROM landing l LEFT JOIN lcatch lc ON l.lid = lc.lid),
      |rec AS (
      |  SELECT municipality, dbs,
      |    COALESCE(${dsumSql("catch_price")}, 0.0) AS rp,
      |    COALESCE(${dsumSql("c")}, 0.0) / 1000.0 AS rc,
      |    ${davgSql("fuel")} AS fu
      |  FROM per GROUP BY municipality, dbs),
      |rec2 AS (
      |  SELECT municipality, dbs,
      |    CASE WHEN rp = 0.0 THEN NULL ELSE rp END AS recorded_catch_price,
      |    CASE WHEN rc = 0.0 THEN NULL ELSE rc END AS recorded_catch,
      |    CASE WHEN fu = 0.0 THEN NULL ELSE fu END AS fuel
      |  FROM rec),
      |model AS (
      |  SELECT 'M' || CAST(o_custkey % 5 AS VARCHAR) AS municipality,
      |    CAST(date_trunc('month', o_orderdate) AS DATE) AS dbs,
      |    ${dsumSql("CAST(o_orderkey % 1000 AS DOUBLE) * 0.125")} AS catch,
      |    ${dsumSql("CAST(o_orderkey % 700 AS DOUBLE) * 0.25")} AS catch_price
      |  FROM orders GROUP BY 1, 2)
      |SELECT m.municipality, m.dbs AS date_bin_start,
      |  CAST(floor(m.catch * 100.0 + 0.5) AS BIGINT) AS catch_e2,
      |  CAST(floor(m.catch_price * 100.0 + 0.5) AS BIGINT) AS model_price_e2,
      |  CAST(floor(r.recorded_catch_price * 100.0 + 0.5) AS BIGINT) AS rec_price_e2,
      |  CAST(floor(r.recorded_catch * 1e6 + 0.5) AS BIGINT) AS rec_catch_e6,
      |  CAST(floor(r.fuel * 1e6 + 0.5) AS BIGINT) AS fuel_e6
      |FROM model m LEFT JOIN rec2 r
      |  ON m.municipality = r.municipality AND m.dbs = r.dbs""".stripMargin))

  /** National monthly predictions fixture (exact-fraction constants). */
  def fixturePredictions(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    orders(s, d).groupBy(
        to_date(date_trunc("month", col("o_orderdate"))).as("landing_period"))
      .agg(
        davg((k % 200).cast("double") * 0.25).as("landing_catch_price"),
        davg((k % 500).cast("double") * 0.5).as("landing_catch"),
        (count(lit(1)).cast("double") / 8.0).as("n_landings_per_boat"),
        dsum((k % 80).cast("double") * 0.25).as("catch_price"),
        dsum((k % 100).cast("double") * 0.5).as("catch"),
        davg((k % 60).cast("double") * 0.125).as("price_kg"))
  }

  /** `today` mid-data so one month is prorated and later months drop. */
  val Today = "1996-06-16"

  val q76 = GQuery(
    "q76_estimation_rollup",
    (s, d) => {
      val p = fixturePredictions(s, d)
      Seq("month", "year").map { g =>
        PublicData.summariseEstimations(p, g, Today)
          .withColumn("grain", lit(g))
      }.reduce(_.unionByName(_))
        .select(col("grain"), col("date_bin_start"),
          floor(col("landing_catch_price") * 1e6 + 0.5).cast("long").as("lcp_e6"),
          floor(col("landing_catch") * 1e6 + 0.5).cast("long").as("lc_e6"),
          floor(col("n_landings_per_boat") * 1e6 + 0.5).cast("long").as("nlb_e6"),
          floor(col("catch_price") * 100.0 + 0.5).cast("long").as("cp_e2"),
          floor(col("catch") * 100.0 + 0.5).cast("long").as("c_e2"),
          floor(col("price_kg") * 1e6 + 0.5).cast("long").as("pk_e6"))
    },
    Some {
      val predsSql =
        s"""preds AS (
           |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS dbs,
           |    ${davgSql("CAST(o_orderkey % 200 AS DOUBLE) * 0.25")} AS landing_catch_price,
           |    ${davgSql("CAST(o_orderkey % 500 AS DOUBLE) * 0.5")} AS landing_catch,
           |    CAST(COUNT(*) AS DOUBLE) / 8.0 AS n_landings_per_boat,
           |    ${dsumSql("CAST(o_orderkey % 80 AS DOUBLE) * 0.25")} AS catch_price,
           |    ${dsumSql("CAST(o_orderkey % 100 AS DOUBLE) * 0.5")} AS catch,
           |    ${davgSql("CAST(o_orderkey % 60 AS DOUBLE) * 0.125")} AS price_kg
           |  FROM orders GROUP BY 1)""".stripMargin
      def grainSql(g: String) =
        s"""SELECT '$g' AS grain,
           |  CAST(date_trunc('$g', dbs) AS DATE) AS date_bin_start,
           |  ${davgSql("landing_catch_price")} AS lcp,
           |  ${davgSql("landing_catch")} AS lc,
           |  COALESCE(${dsumSql("nlb2")}, 0.0) AS nlb,
           |  COALESCE(${dsumSql("cp2")}, 0.0) AS cp,
           |  COALESCE(${dsumSql("c2")}, 0.0) AS c,
           |  ${davgSql("price_kg")} AS pk
           |FROM prorated GROUP BY 1, 2""".stripMargin
      s"""WITH $predsSql,
         |bounds AS (
         |  SELECT date_trunc('year', MIN(dbs)) AS mn,
         |    CASE WHEN MAX(dbs) = date_trunc('year', MAX(dbs)) THEN MAX(dbs)
         |         ELSE CAST(date_trunc('year', MAX(dbs)) + INTERVAL 12 MONTH AS DATE)
         |    END AS mx
         |  FROM preds),
         |spine AS (
         |  SELECT CAST(unnest(generate_series(CAST(mn AS DATE), CAST(mx AS DATE),
         |    INTERVAL 1 MONTH)) AS DATE) AS dbs FROM bounds),
         |completed AS (
         |  SELECT s.dbs, p.landing_catch_price, p.landing_catch,
         |    p.n_landings_per_boat, p.catch_price, p.catch, p.price_kg
         |  FROM spine s LEFT JOIN preds p ON s.dbs = p.dbs),
         |prorated AS (
         |  SELECT dbs, landing_catch_price, landing_catch, price_kg,
         |    CASE WHEN cur THEN n_landings_per_boat * el / pl ELSE n_landings_per_boat END AS nlb2,
         |    CASE WHEN cur THEN catch_price * el / pl ELSE catch_price END AS cp2,
         |    CASE WHEN cur THEN catch * el / pl ELSE catch END AS c2
         |  FROM (
         |    SELECT *,
         |      DATE '$Today' >= dbs AND DATE '$Today' < (dbs + INTERVAL 1 MONTH) AS cur,
         |      CAST(date_diff('day', dbs, DATE '$Today') + 1 AS DOUBLE) AS el,
         |      CAST(date_diff('day', dbs, CAST(dbs + INTERVAL 1 MONTH AS DATE)) AS DOUBLE) AS pl
         |    FROM completed)
         |  WHERE el > 0),
         |rolled AS (${grainSql("month")} UNION ALL ${grainSql("year")})
         |SELECT grain, date_bin_start,
         |  CAST(floor(lcp * 1e6 + 0.5) AS BIGINT) AS lcp_e6,
         |  CAST(floor(lc * 1e6 + 0.5) AS BIGINT) AS lc_e6,
         |  CAST(floor(nlb * 1e6 + 0.5) AS BIGINT) AS nlb_e6,
         |  CAST(floor(cp * 100.0 + 0.5) AS BIGINT) AS cp_e2,
         |  CAST(floor(c * 100.0 + 0.5) AS BIGINT) AS c_e2,
         |  CAST(floor(pk * 1e6 + 0.5) AS BIGINT) AS pk_e6
         |FROM rolled""".stripMargin
    })

  /** `add_calculated_fields` (`R/format-public-data.R:289-327`) over a
    * nested catch column: the rowwise purrr::map closures become
    * higher-order array expressions — no explode, one shuffle (the
    * nest), codegen'd field math. 'N' plays the no-catch marker "0". */
  val q79 = GQuery(
    "q79_calculated_fields",
    (s, d) => {
      val nested = graft.operators.Nest.nest(
        lineitem(s, d),
        keys = Seq("l_orderkey"),
        payload = Seq("l_linenumber", "l_returnflag"),
        orderField = "l_linenumber",
        as = "items")
      PublicData.addCalculatedFields(nested, "items", "l_returnflag", noCatch = "N")
        .select(col("l_orderkey"), col("n_taxa"), col("taxa"))
    },
    Some("""SELECT l_orderkey,
      |  CAST(COUNT(DISTINCT l_returnflag) FILTER (WHERE l_returnflag <> 'N') AS BIGINT) AS n_taxa,
      |  COALESCE(string_agg(l_returnflag, ' ' ORDER BY l_returnflag), '') AS taxa
      |FROM lineitem GROUP BY l_orderkey""".stripMargin))

  /** The CPUE block of `get_summary_data` (`R/format-public-data.R:
    * 862-900`): per-landing composition → guarded ratio → exact median
    * per (municipality, gear). trip_length ≡ 0 for orderkey % 7 == 0
    * landings exercises the is.infinite→NA guard; the all-M4-zero
    * fisher count exercises na.omit dropping a whole group. */
  val q80 = GQuery(
    "q80_cpue_median",
    (s, d) => {
      val o = orders(s, d)
      val rows = lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(
          col("l_orderkey").as("landing_id"),
          concat(lit("M"), (col("o_custkey") % 5).cast("string")).as("municipality"),
          col("o_orderstatus").as("gear"),
          (col("o_orderkey") % 7).cast("double").as("trip_length"),
          when(col("o_custkey") % 5 === 4, lit(0.0))
            .otherwise((col("o_custkey") % 4 + 1).cast("double")).as("n_fishers"),
          col("l_quantity").as("catch"),
          col("l_linenumber").as("ord"))
      PublicData.cpueMedians(rows, "ord")
        .select(col("municipality"), col("gear"),
          floor(col("cpue") * 1e9 + 0.5).cast("long").as("cpue_e9"))
    },
    Some(s"""WITH rows_ AS (
      |  SELECT l_orderkey AS landing_id,
      |    'M' || CAST(o_custkey % 5 AS VARCHAR) AS municipality,
      |    o_orderstatus AS gear,
      |    CAST(o_orderkey % 7 AS DOUBLE) AS trip_length,
      |    CASE WHEN o_custkey % 5 = 4 THEN 0.0
      |         ELSE CAST(o_custkey % 4 + 1 AS DOUBLE) END AS n_fishers,
      |    l_quantity AS catch, l_linenumber AS ord
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |per AS (
      |  SELECT landing_id,
      |    arg_min(municipality, ord) AS municipality,
      |    arg_min(gear, ord) AS gear,
      |    arg_min(trip_length, ord) AS trip_length,
      |    arg_min(n_fishers, ord) AS n_fishers,
      |    ${dsumSql("catch")} AS landing_catch
      |  FROM rows_
      |  WHERE landing_id IS NOT NULL AND catch IS NOT NULL
      |  GROUP BY landing_id),
      |cp AS (
      |  SELECT municipality, gear,
      |    CASE WHEN trip_length <> 0.0 AND n_fishers <> 0.0
      |         THEN (landing_catch / 1000.0 / trip_length) / n_fishers END AS cpue
      |  FROM per),
      |med AS (
      |  SELECT municipality, gear, quantile_cont(cpue, 0.5) AS cpue
      |  FROM cp GROUP BY municipality, gear)
      |SELECT municipality, gear,
      |  CAST(floor(cpue * 1e9 + 0.5) AS BIGINT) AS cpue_e9
      |FROM med WHERE cpue IS NOT NULL""".stripMargin))

  /** q159: k-anonymity audit on a publishable grain — the governance
    * gate behind the export anonymization (q79/q85 hash ids; this
    * measures whether the QUASI-identifiers that survive hashing
    * still isolate individuals). Equivalence classes over (segment,
    * nation, account-balance bin); per segment: class census, the
    * minimum class size (the k in k-anonymity), and the suppression
    * bill if classes under k=5 were withheld. One two-level
    * aggregation — the standard census shape at any scale. */
  val q159 = GQuery(
    "q159_k_anonymity",
    (s, d) => {
      val qi = customer(s, d).select(
        col("c_mktsegment").as("segment"),
        col("c_nationkey").as("nation"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bin"))
      qi.groupBy(col("segment"), col("nation"), col("bal_bin"))
        .agg(lcount(lit(1)).as("cls_n"))
        .groupBy(col("segment"))
        .agg(
          sum(col("cls_n")).as("n_rows"),
          lcount(lit(1)).as("n_classes"),
          min(col("cls_n")).as("k_anonymity"),
          sum(when(col("cls_n") < 5, 1L).otherwise(0L)).as("n_small_classes"),
          sum(when(col("cls_n") < 5, col("cls_n")).otherwise(lit(0L)))
            .as("n_suppressed"))
    },
    Some("""WITH qi AS (
      |  SELECT c_mktsegment AS segment, c_nationkey AS nation,
      |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bin
      |  FROM customer),
      |cls AS (
      |  SELECT segment, nation, bal_bin, COUNT(*) AS cls_n
      |  FROM qi GROUP BY segment, nation, bal_bin)
      |SELECT segment, CAST(SUM(cls_n) AS BIGINT) AS n_rows,
      |  COUNT(*) AS n_classes, MIN(cls_n) AS k_anonymity,
      |  CAST(SUM(CASE WHEN cls_n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
      |  CAST(SUM(CASE WHEN cls_n < 5 THEN cls_n ELSE 0 END) AS BIGINT) AS n_suppressed
      |FROM cls GROUP BY segment""".stripMargin))

  /** q168: epsilon-DP release of the per-(lang, source) corpus census
    * ([[graft.stats.Privacy.dpRelease]]) — the mechanism upgrade over
    * the q159 k-anonymity audit for stats published OUTSIDE the
    * pipeline's trust boundary: per-record contribution clamping,
    * seeded-Laplace noise (count: b=1/eps, clamped char mass:
    * b=clamp/eps), and noisy-threshold suppression. All column
    * expressions over one aggregation; the oracle replays the md5
    * draws through the same inverse CDF. */
  val q168 = GQuery(
    "q168_dp_release",
    (s, d) => graft.stats.Privacy.dpRelease(
      documents(s, d), Seq("lang", "source"), seed = "dp-r6",
      eps = 1.0, clampChars = 4000L, charsCol = "n_chars",
      releaseMin = 5.0),
    Some("""WITH g AS (
      |  SELECT lang, source, COUNT(*) AS n_docs,
      |    CAST(SUM(LEAST(n_chars, 4000)) AS BIGINT) AS char_mass
      |  FROM documents GROUP BY lang, source),
      |n AS (
      |  SELECT *,
      |    (CAST(('0x' || substr(md5('dp-r6' || 'n:' || lang || source), 1, 13)) AS BIGINT) + 0.5)
      |      / 4503599627370496.0 - 0.5 AS cn,
      |    (CAST(('0x' || substr(md5('dp-r6' || 'm:' || lang || source), 1, 13)) AS BIGINT) + 0.5)
      |      / 4503599627370496.0 - 0.5 AS cm
      |  FROM g),
      |r AS (
      |  SELECT lang, source,
      |    ROUND(n_docs + (-1.0) * SIGN(cn) * LN(1 - 2 * ABS(cn)), 4) AS dp_n_docs,
      |    ROUND(char_mass + (-4000.0) * SIGN(cm) * LN(1 - 2 * ABS(cm)), 4) AS dp_char_mass
      |  FROM n)
      |SELECT lang, source, dp_n_docs, dp_char_mass
      |FROM r WHERE dp_n_docs >= 5.0""".stripMargin))

  /** q190: the portal's per-habitat indicator SERIES
    * ([[PublicData.jsonifyIndicators]], `R/format-public-data.R:1094-1173`)
    * — the last reference surface that had no hash gate: per-(habitat,
    * gear) decimal-routed means, small groups (n ≤ 50) suppressed,
    * gears ordered by value inside each habitat, habitats ranked by
    * summed value, each habitat emitted as ONE row whose `data` column
    * is the [{x: gear, y: value}] JSON array the portal renders. The
    * JSON STRING itself sits under the hash, which works because both
    * engines print doubles as shortest-round-trip decimals and both
    * build the array in the same (y DESC, gear DESC) order. Fixture
    * plants a rare gear (< minN rows) to exercise the suppression. */
  val q190 = GQuery(
    "q190_indicator_series",
    (s, d) => {
      val k = col("o_orderkey")
      val obs = orders(s, d).select(
        concat(lit("H"), (k % 4).cast("string")).as("habitat"),
        when(k % 1009 === 0, lit("G_rare"))
          .otherwise(concat(lit("G"), (k % 7).cast("string"))).as("gear"),
        ((k % 97).cast("double") * 0.25).as("cpue"))
      PublicData.jsonifyIndicators(obs, "cpue", minN = 50)
    },
    Some(s"""WITH obs AS (
      |  SELECT 'H' || CAST(o_orderkey % 4 AS VARCHAR) AS habitat,
      |    CASE WHEN o_orderkey % 1009 = 0 THEN 'G_rare'
      |         ELSE 'G' || CAST(o_orderkey % 7 AS VARCHAR) END AS gear,
      |    CAST(o_orderkey % 97 AS DOUBLE) * 0.25 AS cpue
      |  FROM orders),
      |grouped AS (
      |  SELECT habitat, gear, round(${davgSql("cpue")}, 3) AS y, COUNT(*) AS n
      |  FROM obs GROUP BY habitat, gear),
      |kept AS (SELECT * FROM grouped WHERE n > 50),
      |ranked AS (
      |  SELECT habitat, ${dsumSql("y")} AS hsum FROM kept GROUP BY habitat)
      |SELECT k.habitat AS name,
      |  to_json(list(struct_pack(x := k.gear, y := k.y)
      |    ORDER BY k.y DESC, k.gear DESC)) AS data
      |FROM kept k JOIN ranked r ON k.habitat = r.habitat
      |GROUP BY k.habitat, r.hsum""".stripMargin))

  /** q210: l-diversity audit on the q159 publishable grain — the
    * attribute-disclosure upgrade over bare k-anonymity (Machanavajjhala
    * et al. 2007): a class can be large (k-anonymous) yet expose its
    * SENSITIVE attribute if every member shares one value. Per
    * equivalence class: distinct sensitive values (here the customer's
    * nation serves as the sensitive column against the
    * (segment, bal_bin) quasi-identifiers); per segment: the minimum
    * class diversity (the l), classes failing l=3, and the rows a
    * suppression pass would withhold. Same two-level census shape as
    * q159 — one extra distinct per class, still one shuffle. */
  val q210 = GQuery(
    "q210_l_diversity",
    (s, d) => {
      val qi = customer(s, d).select(
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bin"),
        col("c_nationkey").as("sensitive"))
      qi.groupBy(col("segment"), col("bal_bin"))
        .agg(lcount(lit(1)).as("cls_n"),
          countDistinct(col("sensitive")).as("cls_l"))
        .groupBy(col("segment"))
        .agg(
          sum(col("cls_n")).as("n_rows"),
          lcount(lit(1)).as("n_classes"),
          min(col("cls_l")).as("l_diversity"),
          sum(when(col("cls_l") < 3, 1L).otherwise(0L)).as("n_low_classes"),
          sum(when(col("cls_l") < 3, col("cls_n")).otherwise(lit(0L)))
            .as("n_suppressed"))
    },
    Some("""WITH qi AS (
      |  SELECT c_mktsegment AS segment,
      |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bin,
      |    c_nationkey AS sensitive
      |  FROM customer),
      |cls AS (
      |  SELECT segment, bal_bin, COUNT(*) AS cls_n,
      |    CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS cls_l
      |  FROM qi GROUP BY segment, bal_bin)
      |SELECT segment, CAST(SUM(cls_n) AS BIGINT) AS n_rows,
      |  COUNT(*) AS n_classes, MIN(cls_l) AS l_diversity,
      |  CAST(SUM(CASE WHEN cls_l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_classes,
      |  CAST(SUM(CASE WHEN cls_l < 3 THEN cls_n ELSE 0 END) AS BIGINT) AS n_suppressed
      |FROM cls GROUP BY segment""".stripMargin))

  /** q287: t-closeness audit on the q159 publishable grain — the third
    * rung of the governance ladder (k-anonymity bounds class size,
    * l-diversity bounds sensitive-value count, t-closeness bounds how
    * much a class's sensitive DISTRIBUTION leaks vs the global one):
    * per (segment, nation) class, the Earth-Mover's Distance between
    * the class's account-balance-bin distribution and the global one,
    * over the ORDERED bin domain — EMD(ordered, unit spacing) =
    * Σ|cumP−cumQ|/(m−1). ENTIRELY exact: cumulative counts are
    * cross-multiplied (|cum_c·N − cum_g·n_c|, DECIMAL(38,0)-routed)
    * and the final EMD is one truncating ÷ at e6. The class × bin grid
    * is domain-bounded (completed with zero rows so absent bins still
    * move mass), never row-scaled. */
  val q287 = GQuery(
    "q287_t_closeness",
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val W = org.apache.spark.sql.expressions.Window
      val qi = customer(s, d).select(
        col("c_mktsegment").as("segment"),
        col("c_nationkey").as("nation"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bin"))
      val cls = qi.groupBy(col("segment"), col("nation"), col("bal_bin"))
        .agg(lcount(lit(1)).as("cnt"))
        .localCheckpoint(eager = false) // grid fill + class sizes + bins
      val bins = cls.select(col("bal_bin")).distinct()
      val classes = cls.groupBy(col("segment"), col("nation"))
        .agg(sum(col("cnt")).as("n_c"))
      val glob = cls.groupBy(col("bal_bin")).agg(sum(col("cnt")).as("gcnt"))
        .withColumn("cum_g", sum(col("gcnt")).over(
          W.orderBy(col("bal_bin"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
      val scal = glob.agg(sum(col("gcnt")).as("n_all"),
        lcount(lit(1)).as("m"))
      val grid = classes.crossJoin(broadcast(bins)) // domain-bounded
        // the class-bin census is domain-bounded but landed (default
        // stats) — hint the broadcast a fresh frame would get on its own
        .join(broadcast(cls), Seq("segment", "nation", "bal_bin"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        .withColumn("cum_c", sum(col("cnt")).over(
          W.partitionBy(col("segment"), col("nation")).orderBy(col("bal_bin"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
      grid.join(broadcast(glob.select(col("bal_bin"), col("cum_g"))), Seq("bal_bin"))
        .crossJoin(broadcast(scal)) // 1-row scalar
        .groupBy(col("segment"), col("nation"), col("n_c"), col("n_all"), col("m"))
        .agg(sum(abs(col("cum_c").cast(dec) * col("n_all")
          - col("cum_g").cast(dec) * col("n_c"))).as("sdiff"))
        .select(col("segment"), col("nation"), col("n_c"),
          expr("(sdiff * 1000000) div (CAST(n_c AS DECIMAL(38,0)) * n_all * (m - 1))")
            .as("emd_e6"))
        .orderBy(col("emd_e6").desc, col("segment"), col("nation"))
    },
    Some("""WITH qi AS (
      |  SELECT c_mktsegment AS segment, c_nationkey AS nation,
      |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bin
      |  FROM customer),
      |cls AS MATERIALIZED (
      |  SELECT segment, nation, bal_bin, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM qi GROUP BY 1, 2, 3),
      |bins AS (SELECT DISTINCT bal_bin FROM cls),
      |classes AS (
      |  SELECT segment, nation, CAST(SUM(cnt) AS BIGINT) AS n_c
      |  FROM cls GROUP BY 1, 2),
      |gcum AS MATERIALIZED (
      |  SELECT bal_bin, SUM(gcnt) OVER (ORDER BY bal_bin ROWS UNBOUNDED PRECEDING)
      |      AS cum_g
      |  FROM (SELECT bal_bin, CAST(SUM(cnt) AS BIGINT) AS gcnt
      |        FROM cls GROUP BY bal_bin)),
      |scal AS (
      |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_all,
      |    CAST(COUNT(DISTINCT bal_bin) AS BIGINT) AS m
      |  FROM cls),
      |grid AS (
      |  SELECT c.segment, c.nation, c.n_c, b.bal_bin,
      |    SUM(COALESCE(x.cnt, 0)) OVER (PARTITION BY c.segment, c.nation
      |      ORDER BY b.bal_bin ROWS UNBOUNDED PRECEDING) AS cum_c
      |  FROM classes c CROSS JOIN bins b
      |  LEFT JOIN cls x ON x.segment = c.segment AND x.nation = c.nation
      |    AND x.bal_bin = b.bal_bin)
      |SELECT g.segment, g.nation, g.n_c,
      |  CAST((SUM(abs(CAST(g.cum_c AS HUGEINT) * s.n_all
      |     - CAST(gl.cum_g AS HUGEINT) * g.n_c)) * 1000000)
      |    // (CAST(g.n_c AS HUGEINT) * s.n_all * (s.m - 1)) AS BIGINT) AS emd_e6
      |FROM grid g JOIN gcum gl ON g.bal_bin = gl.bal_bin, scal s
      |GROUP BY g.segment, g.nation, g.n_c, s.n_all, s.m
      |ORDER BY emd_e6 DESC, segment, nation""".stripMargin))

  def queries: Seq[GQuery] =
    Seq(q75, q76, q79, q80, q159, q168, q190, q210, q287)
}
