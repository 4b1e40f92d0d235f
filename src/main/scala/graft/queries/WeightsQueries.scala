package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.pipeline.Weights

/** The composed calculate_weights stage (SURVEY §2.9 ST3,
  * `/root/reference/R/calculate-weights.R:452-569`) gated end-to-end on
  * the synthetic tables: a FishBase-style raw morphometric frame is
  * derived deterministically from `part` (plus a two-row "manual
  * additions" frame, one of which the quality filter drops), the lw/ll
  * coefficient tables are built through [[Weights.morphometricTables]]
  * (aTL augmentation, EsQ quality filter with R's null-passes-isTRUE
  * semantics, reciprocal length-length augmentation, distinct), catch
  * rows derived from `lineitem` run through
  * [[Weights.estimateWeights]] (guards, candidate generation,
  * taxon-specific quantile × n_individuals), and the output hashes both
  * the coefficient tables (per-code counts + coefficient sums) and the
  * per-code weight estimates.
  */
object WeightsQueries {

  /** Brand-keyed analogue of the reference's taxon quantile map
    * (`R/calculate-weights.R:560-566`). */
  private val brandQuantiles: Map[String, Double] = Map(
    "Brand#12" -> 0.75, "Brand#21" -> 0.75,
    "Brand#23" -> 0.7, "Brand#34" -> 0.7)

  val q92 = GQuery(
    "q92_calculate_weights",
    (s, d) => {
      import s.implicits._
      val g = col("p_size") % 4
      val aExpr = lit(0.005) * (g + 1).cast("double") +
        lit(0.0001) * length(col("p_type")).cast("double")
      val bnum = substring(col("p_brand"), 7, 1).cast("int").cast("double")
      val raw = part(s, d).select(
        col("p_brand").as("interagency_code"),
        col("p_type").as("Species"),
        g.cast("double").as("LengthMin"),
        (g.cast("double") + 50.0).as("LengthMax"),
        when(g % 2 === 0, "TL").otherwise("FL").as("Type"),
        aExpr.as("a"),
        when(g === 0, aExpr * 1.2).as("aTL"),
        (lit(2.0) + g.cast("double") * 0.15 + bnum * 0.05).as("b"),
        // g==2 exercises R's isTRUE(NA == "yes") → keep semantics
        when(g === 3, "yes").when(g === 2, lit(null)).otherwise("no").as("EsQ"),
        when(g % 2 === 0, "TL").otherwise("FL").as("Length1"),
        when(g % 2 === 0, "FL").otherwise("TL").as("Length2"),
        when(g === 1, lit(0.2) + lit(0.01) * bnum).as("aL"),
        (lit(1.0) + g.cast("double") * 0.25).as("bL"))
      val manual = Seq(
        ("Brand#11", "manual species", 0.0, 50.0, "TL", 0.0123, 2.8, "no"),
        ("Brand#55", "manual low", 1.0, 51.0, "FL", 0.0456, 2.2, "yes"))
        .toDF("interagency_code", "Species", "LengthMin", "LengthMax",
          "Type", "a", "b", "EsQ")
      val (lw, ll) = Weights.morphometricTables(raw, manual)
      val catchRows = lineitem(s, d)
        .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(
          when(col("l_partkey") % 50 === 0, "0").otherwise(col("p_brand")).as("code"),
          col("l_quantity").as("length"),
          when(col("l_linenumber") % 2 === 0, "TL").otherwise("FL").as("length_type"),
          (col("l_linenumber") - 1).cast("double").as("n_individuals"))
      val est = Weights.estimateWeights(catchRows, lw, ll,
        brandQuantiles, defaultQ = 0.9)
      val lwStats = lw.groupBy(col("interagency_code").as("code"))
        .agg(lcount(lit(1)).as("n_lw"),
          lsum6(col("a")).as("sum_a"), lsum6(col("b")).as("sum_b"))
      val llStats = ll.groupBy(col("interagency_code").as("code"))
        .agg(lcount(lit(1)).as("n_ll"),
          lsum6(col("aL")).as("sum_al"), lsum6(col("bL")).as("sum_bl"))
      est.groupBy(col("code"))
        .agg(
          lcount(lit(1)).as("n_rows"),
          count(col("weight_est")).as("n_est"),
          count(when(col("weight_est") === 0.0, 1)).as("n_zero"),
          lsum6(round(col("weight_est"), 6)).as("sum_w"))
        .join(broadcast(lwStats), Seq("code"), "left")
        .join(broadcast(llStats), Seq("code"), "left")
    },
    Some(s"""WITH raw AS (
      |  SELECT p_brand AS code, p_type AS species,
      |    CAST(p_size % 4 AS DOUBLE) AS lengthmin,
      |    CAST(p_size % 4 AS DOUBLE) + 50.0 AS lengthmax,
      |    CASE WHEN (p_size % 4) % 2 = 0 THEN 'TL' ELSE 'FL' END AS type,
      |    0.005 * CAST((p_size % 4) + 1 AS DOUBLE)
      |      + 0.0001 * CAST(length(p_type) AS DOUBLE) AS a,
      |    CASE WHEN p_size % 4 = 0 THEN (0.005 * CAST((p_size % 4) + 1 AS DOUBLE)
      |      + 0.0001 * CAST(length(p_type) AS DOUBLE)) * 1.2 END AS atl,
      |    2.0 + CAST(p_size % 4 AS DOUBLE) * 0.15
      |      + CAST(CAST(substr(p_brand, 7, 1) AS INT) AS DOUBLE) * 0.05 AS b,
      |    CASE WHEN p_size % 4 = 3 THEN 'yes'
      |         WHEN p_size % 4 = 2 THEN NULL ELSE 'no' END AS esq,
      |    CASE WHEN (p_size % 4) % 2 = 0 THEN 'TL' ELSE 'FL' END AS length1,
      |    CASE WHEN (p_size % 4) % 2 = 0 THEN 'FL' ELSE 'TL' END AS length2,
      |    CASE WHEN p_size % 4 = 1
      |      THEN 0.2 + 0.01 * CAST(CAST(substr(p_brand, 7, 1) AS INT) AS DOUBLE) END AS al,
      |    1.0 + CAST(p_size % 4 AS DOUBLE) * 0.25 AS bl
      |  FROM part
      |  UNION ALL SELECT 'Brand#11', 'manual species', 0.0, 50.0, 'TL',
      |    0.0123, NULL, 2.8, 'no', NULL, NULL, NULL, NULL
      |  UNION ALL SELECT 'Brand#55', 'manual low', 1.0, 51.0, 'FL',
      |    0.0456, NULL, 2.2, 'yes', NULL, NULL, NULL, NULL),
      |lw AS (
      |  SELECT DISTINCT code, species, lengthmin, lengthmax, type, a, b FROM (
      |    SELECT code, species, lengthmin, lengthmax, 'TL' AS type, atl AS a, b, esq FROM raw
      |    UNION ALL
      |    SELECT code, species, lengthmin, lengthmax, type, a, b, esq FROM raw)
      |  WHERE a IS NOT NULL AND NOT (lower(esq) IS NOT DISTINCT FROM 'yes')),
      |ll AS (
      |  SELECT DISTINCT code, species, length1, length2, al, bl FROM (
      |    SELECT code, species, length2 AS length1, length1 AS length2,
      |      al / bl * (-1.0) AS al, 1.0 / bl AS bl FROM raw
      |    UNION ALL
      |    SELECT code, species, length1, length2, al, bl FROM raw)
      |  WHERE al IS NOT NULL),
      |catch AS (
      |  SELECT CASE WHEN l_partkey % 50 = 0 THEN '0' ELSE p_brand END AS code,
      |    l_quantity AS length,
      |    CASE WHEN l_linenumber % 2 = 0 THEN 'TL' ELSE 'FL' END AS length_type,
      |    CAST(l_linenumber - 1 AS DOUBLE) AS n_individuals
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |combos AS (
      |  SELECT DISTINCT code, length, length_type FROM catch
      |  WHERE code IS NOT NULL AND code <> '0' AND length IS NOT NULL
      |    AND length_type IS NOT NULL),
      |spx AS (SELECT DISTINCT code, species FROM lw),
      |cand AS (
      |  SELECT c.code, c.length, c.length_type,
      |    s.species, c.length_type AS type, c.length AS len
      |  FROM combos c JOIN spx s ON c.code = s.code
      |  UNION ALL
      |  SELECT c.code, c.length, c.length_type,
      |    l.species, l.length1 AS type, l.al + c.length * l.bl AS len
      |  FROM combos c JOIN ll l ON c.code = l.code AND l.length2 = c.length_type),
      |w AS (
      |  SELECT c.code, c.length, c.length_type, lw.a * pow(c.len, lw.b) AS w
      |  FROM cand c JOIN lw
      |    ON c.code = lw.code AND c.species = lw.species AND c.type = lw.type),
      |ps AS (
      |  SELECT code, length, length_type,
      |    quantile_cont(w, 0.7) AS q70, quantile_cont(w, 0.75) AS q75,
      |    quantile_cont(w, 0.9) AS q90
      |  FROM w GROUP BY 1, 2, 3),
      |est AS (
      |  SELECT c.code,
      |    CASE WHEN c.code IS NULL OR c.code = '0' OR c.length IS NULL
      |           OR c.length_type IS NULL OR c.n_individuals IS NULL THEN NULL
      |         WHEN c.n_individuals = 0 THEN 0.0
      |         ELSE (CASE WHEN c.code IN ('Brand#23', 'Brand#34') THEN p.q70
      |                    WHEN c.code IN ('Brand#12', 'Brand#21') THEN p.q75
      |                    ELSE p.q90 END) * c.n_individuals END AS weight_est
      |  FROM catch c LEFT JOIN ps p
      |    ON c.code = p.code AND c.length = p.length
      |    AND c.length_type = p.length_type),
      |lws AS (SELECT code, COUNT(*) AS n_lw, ${sqlLsum6("a")} AS sum_a,
      |  ${sqlLsum6("b")} AS sum_b FROM lw GROUP BY code),
      |lls AS (SELECT code, COUNT(*) AS n_ll, ${sqlLsum6("al")} AS sum_al,
      |  ${sqlLsum6("bl")} AS sum_bl FROM ll GROUP BY code)
      |SELECT e.code, COUNT(*) AS n_rows, COUNT(e.weight_est) AS n_est,
      |  COUNT(CASE WHEN e.weight_est = 0.0 THEN 1 END) AS n_zero,
      |  ${sqlLsum6("round(e.weight_est, 6)")} AS sum_w,
      |  MIN(s.n_lw) AS n_lw, MIN(s.sum_a) AS sum_a, MIN(s.sum_b) AS sum_b,
      |  MIN(t.n_ll) AS n_ll, MIN(t.sum_al) AS sum_al, MIN(t.sum_bl) AS sum_bl
      |FROM est e LEFT JOIN lws s ON e.code = s.code
      |  LEFT JOIN lls t ON e.code = t.code
      |GROUP BY e.code""".stripMargin),
    headline = true)

  def queries: Seq[GQuery] = Seq(q92)
}
