package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Harmonize

/** The reference's value-recode dictionaries, transcribed verbatim
  * (`/root/reference/R/clean-raw-data.R`): the legacy-SSF → peskas
  * species map (`:113-176`), the v2 gear / habitat / mesh / site / boat
  * recodes (`:373-401`), and the food-or-sale normalization (`:96-103`).
  * Each compiles into a codegen'd `when` chain
  * ([[Harmonize.recodeOrdered]]) — dictionary size is schema-sized, so
  * no join, no shuffle, first-match-wins `case_when` parity (code 116
  * appears under two arms; the earlier one wins).
  */
object Recodes {

  private def entries(pairs: (Seq[String], String)*): Seq[(String, Option[String])] =
    pairs.flatMap { case (keys, to) => keys.map(_ -> Some(to)) }

  private def nums(ns: Int*): Seq[String] = ns.map(_.toString)
  private def range(a: Int, b: Int): Seq[String] = (a to b).map(_.toString)

  /** Legacy SSF species codes → peskas catch codes, in the reference's
    * arm order (`R/clean-raw-data.R:118-176`). */
  val species: Seq[(String, Option[String])] = entries(
    nums(93) -> "1",
    nums(86, 87, 211) -> "2",
    nums(2, 8, 46, 47, 48, 49, 50, 85, 103) -> "3",
    nums(5, 6, 7, 9, 91, 92, 94) -> "4",
    range(41, 45) -> "5",
    nums(88) -> "6",
    nums(90, 149) -> "7",
    nums(107, 109) -> "8",
    nums(1) -> "9",
    (range(31, 40) ++ nums(95, 96, 97, 98, 99, 100, 104)) -> "10",
    nums(116, 117, 118) -> "11",
    range(11, 30) -> "12",
    (range(51, 60) :+ "143") -> "13",
    nums(119, 120, 121, 144) -> "14",
    range(61, 72) -> "15",
    nums(145, 146) -> "16",
    nums(89, 418) -> "17",
    (nums(122, 123, 124, 125, 126) :+ "mamila_matamouk") -> "18",
    nums(75) -> "19",
    nums(4, 101, 102) -> "20",
    nums(133, 134, 135, 136, 213) -> "21",
    nums(10) -> "22",
    nums(105, 106) -> "23",
    nums(153) -> "24",
    nums(417) -> "25",
    nums(416, 216) -> "26",
    nums(84) -> "27",
    (nums(79) :+ "bete_debedor") -> "28",
    nums(112, 113, 115) -> "29",
    nums(151) -> "30",
    nums(110, 111, 116, 150) -> "31", // 116 dead: already taken by "11"
    nums(80, 81) -> "32",
    nums(83, 214) -> "33",
    nums(140, 141, 142, 212) -> "34",
    range(127, 132) -> "35",
    nums(217) -> "36",
    nums(215) -> "37",
    nums(219) -> "38",
    nums(148) -> "39",
    nums(152) -> "41",
    nums(74, 76) -> "42",
    nums(114) -> "43",
    nums(203) -> "44",
    nums(420) -> "45",
    nums(3) -> "46",
    nums(147) -> "47",
    nums(73) -> "48",
    nums(77, 78, 82) -> "49",
    nums(218) -> "50",
    Seq("budu_tasi") -> "58",
    (nums(139, 209, 300, 999) ++ Seq("babuti", "ikan_kulu", "kabosu",
      "kalepa_makerek", "lea", "lepulai", "pakulai", "teura_marubi")) -> "300")

  /** v2 gear codes → gear type abbreviations (`R/clean-raw-data.R:377-387`). */
  val gear: Seq[(String, Option[String])] = entries(
    Seq("1") -> "GN", Seq("2") -> "HL", Seq("3") -> "LL", Seq("4") -> "SG",
    Seq("5") -> "CN", Seq("6") -> "MC", Seq("7") -> "BS", Seq("8") -> "SN")

  /** v2 habitat free-text → codes (`R/clean-raw-data.R:388-392`). */
  val habitat: Seq[(String, Option[String])] = entries(
    Seq("rompun") -> "2", Seq("deep") -> "3")

  /** v2 mesh size (`R/clean-raw-data.R:373-376`). */
  val meshSize: Seq[(String, Option[String])] = entries(Seq("AUTOMATIC") -> "4")

  /** v2 landing site (`R/clean-raw-data.R:393-397`): LOR is an error →
    * null; COM folds into site 7. */
  val landingSite: Seq[(String, Option[String])] =
    Seq("LOR" -> None, "COM" -> Some("7"))

  /** v2 boat type (`R/clean-raw-data.R:398-401`): code 3 is invalid → null. */
  val boatType: Seq[(String, Option[String])] = Seq("3" -> None)

  /** food_or_sale normalization (`R/clean-raw-data.R:96-103`). */
  val foodOrSale: Seq[(String, Option[String])] =
    Seq("nain_rua" -> Some("both"))

  def recodeSpecies(c: Column): Column = Harmonize.recodeOrdered(c, species)
  def recodeGear(c: Column): Column = Harmonize.recodeOrdered(c, gear)
  def recodeHabitat(c: Column): Column = Harmonize.recodeOrdered(c, habitat)
  def recodeMesh(c: Column): Column = Harmonize.recodeOrdered(c, meshSize)
  def recodeSite(c: Column): Column = Harmonize.recodeOrdered(c, landingSite)
  def recodeBoat(c: Column): Column = Harmonize.recodeOrdered(c, boatType)
  def recodeFoodOrSale(c: Column): Column = Harmonize.recodeOrdered(c, foodOrSale)

  /** `clean_preprocessed_landings_step_1`'s value recodes
    * (`R/clean-raw-data.R:366-401`) over the raw v2 Kobo column names —
    * applied before [[MergeLandings.tagAndUnion]], as the reference
    * cleans each generation before the union. Missing columns are left
    * untouched (schema drift tolerance). */
  def cleanStep1(df: DataFrame): DataFrame = {
    val recodesByCol = Seq(
      "trip_group/mesh_size" -> recodeMesh _,
      "trip_group/gear_type" -> recodeGear _,
      "trip_group/habitat_boat" -> recodeHabitat _,
      "landing_site_name" -> recodeSite _,
      "trip_group/boat_type" -> recodeBoat _)
    recodesByCol.foldLeft(df) { case (acc, (name, fn)) =>
      if (acc.columns.contains(name)) acc.withColumn(name, fn(col(s"`$name`")))
      else acc
    }
  }

  /** Legacy (v1 SSF) species recode over every `*species` column of a
    * wide catches frame (the reference pivots longer, recodes, pivots
    * back, `R/clean-raw-data.R:112-181`; column-wise `when` chains are
    * the Spark-first equivalent — same values, no reshape). */
  def recodeLegacySpecies(df: DataFrame): DataFrame =
    df.columns.filter(_.endsWith("species")).foldLeft(df) { (acc, c) =>
      acc.withColumn(c, recodeSpecies(col(s"`$c`")))
    }
}
