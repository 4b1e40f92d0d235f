package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.pipeline.Recodes

/** q93: the transcribed recode dictionaries (species / gear / habitat /
  * mesh / site / boat / food_or_sale, `R/clean-raw-data.R:96-103,
  * 113-176,373-401`) gated end-to-end. The fixture keys variety off
  * `o_orderkey` directly — dense 0..N-1 in the synthetic tables, so
  * every dictionary entry (all ~160 keys, including the 11 free-text
  * species keys and the first-match-wins collision on code 116) is
  * exercised at every scale factor with N > 1013 rows, and the fixture
  * needs no global-ordering window (a row_number over an unpartitioned
  * window collapses to one task — the single-partition anti-pattern
  * this query previously hid; with the window gone and the one-file
  * input widened, 2.3 s single-task at sf0.1 became 1.0 s). The DuckDB oracle's CASE chains are
  * GENERATED from the same Scala dictionaries, so the two engines
  * cannot drift. */
object RecodeQueries {

  private val textKeys = Seq("mamila_matamouk", "bete_debedor", "budu_tasi",
    "babuti", "ikan_kulu", "kabosu", "kalepa_makerek", "lea", "lepulai",
    "pakulai", "teura_marubi")

  /** `case_when`-ordered SQL mirror of a dictionary. */
  private def caseSql(expr: String, entries: Seq[(String, Option[String])]): String =
    "CASE " + entries.map { case (k, v) =>
      s"WHEN $expr = '$k' THEN ${v.map(x => s"'$x'").getOrElse("NULL")}"
    }.mkString(" ") + s" ELSE $expr END"

  /** Species raw-code expression: residues ≥ 1000 become the free-text
    * keys, everything else the decimal string. */
  private def spRawSql: String =
    "CASE " + textKeys.zipWithIndex.map { case (k, i) =>
      s"WHEN rn % 1013 = ${1000 + i} THEN '$k'"
    }.mkString(" ") + " ELSE CAST(rn % 1013 AS VARCHAR) END"

  val q93 = GQuery(
    "q93_recode_dictionaries",
    (s, d) => {
      val m = col("rn") % 1013
      val spRaw = textKeys.zipWithIndex
        .foldLeft(when(lit(false), lit(""))) { case (acc, (k, i)) =>
          acc.when(m === (1000 + i), lit(k))
        }.otherwise(m.cast("string"))
      // widen: the 160-branch recode chain over a one-file local input
      // would otherwise run on a single task (Widen is a no-op on
      // production inputs that already arrive in many splits)
      val base = graft.core.Widen.widen(
        orders(s, d).select(col("o_orderkey").as("rn")))
        .select(
          spRaw.as("sp_raw"),
          (col("rn") % 12).cast("string").as("gear_raw"),
          when(col("rn") % 5 === 0, "rompun").when(col("rn") % 5 === 1, "deep")
            .when(col("rn") % 5 === 2, "1").when(col("rn") % 5 === 3, "2")
            .otherwise("reef").as("hab_raw"),
          when(col("rn") % 3 === 0, "AUTOMATIC").when(col("rn") % 3 === 1, "25")
            .otherwise("seluk").as("mesh_raw"),
          when(col("rn") % 4 === 0, "LOR").when(col("rn") % 4 === 1, "COM")
            .when(col("rn") % 4 === 2, "5").otherwise("9").as("site_raw"),
          (col("rn") % 5).cast("string").as("boat_raw"),
          when(col("rn") % 3 === 0, "nain_rua").when(col("rn") % 3 === 1, "food")
            .otherwise("sale").as("food_raw"))
      def entry(dict: String, raw: Column, rec: Column) =
        struct(lit(dict).as("dict"), raw.as("raw"), rec.as("code"))
      val stacked = base.select(explode(array(
        entry("species", col("sp_raw"), Recodes.recodeSpecies(col("sp_raw"))),
        entry("gear", col("gear_raw"), Recodes.recodeGear(col("gear_raw"))),
        entry("habitat", col("hab_raw"), Recodes.recodeHabitat(col("hab_raw"))),
        entry("mesh", col("mesh_raw"), Recodes.recodeMesh(col("mesh_raw"))),
        entry("site", col("site_raw"), Recodes.recodeSite(col("site_raw"))),
        entry("boat", col("boat_raw"), Recodes.recodeBoat(col("boat_raw"))),
        entry("food", col("food_raw"), Recodes.recodeFoodOrSale(col("food_raw")))
      )).as("r")).select("r.*")
      stacked.groupBy(col("dict"), col("code"))
        .agg(lcount(lit(1)).as("n"), countDistinct(col("raw")).as("n_raw"))
    },
    Some(s"""WITH base AS (
      |  SELECT o_orderkey AS rn FROM orders),
      |derived AS (
      |  SELECT $spRawSql AS sp_raw,
      |    CAST(rn % 12 AS VARCHAR) AS gear_raw,
      |    CASE WHEN rn % 5 = 0 THEN 'rompun' WHEN rn % 5 = 1 THEN 'deep'
      |         WHEN rn % 5 = 2 THEN '1' WHEN rn % 5 = 3 THEN '2'
      |         ELSE 'reef' END AS hab_raw,
      |    CASE WHEN rn % 3 = 0 THEN 'AUTOMATIC' WHEN rn % 3 = 1 THEN '25'
      |         ELSE 'seluk' END AS mesh_raw,
      |    CASE WHEN rn % 4 = 0 THEN 'LOR' WHEN rn % 4 = 1 THEN 'COM'
      |         WHEN rn % 4 = 2 THEN '5' ELSE '9' END AS site_raw,
      |    CAST(rn % 5 AS VARCHAR) AS boat_raw,
      |    CASE WHEN rn % 3 = 0 THEN 'nain_rua' WHEN rn % 3 = 1 THEN 'food'
      |         ELSE 'sale' END AS food_raw
      |  FROM base),
      |stacked AS (
      |  SELECT 'species' AS dict, sp_raw AS raw, ${caseSql("sp_raw", Recodes.species)} AS code FROM derived
      |  UNION ALL SELECT 'gear', gear_raw, ${caseSql("gear_raw", Recodes.gear)} FROM derived
      |  UNION ALL SELECT 'habitat', hab_raw, ${caseSql("hab_raw", Recodes.habitat)} FROM derived
      |  UNION ALL SELECT 'mesh', mesh_raw, ${caseSql("mesh_raw", Recodes.meshSize)} FROM derived
      |  UNION ALL SELECT 'site', site_raw, ${caseSql("site_raw", Recodes.landingSite)} FROM derived
      |  UNION ALL SELECT 'boat', boat_raw, ${caseSql("boat_raw", Recodes.boatType)} FROM derived
      |  UNION ALL SELECT 'food', food_raw, ${caseSql("food_raw", Recodes.foodOrSale)} FROM derived)
      |SELECT dict, code, COUNT(*) AS n, COUNT(DISTINCT raw) AS n_raw
      |FROM stacked GROUP BY dict, code""".stripMargin))

  def queries: Seq[GQuery] = Seq(q93)
}
