package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Recodes

/** Recode dictionaries (`R/clean-raw-data.R:96-103,113-176,373-401`):
  * spot-checked mappings, case_when precedence, null targets, and the
  * step-1 wiring over raw Kobo column names. */
class RecodesSpec extends SparkSpec {
  import spark.implicits._

  test("species map: spot mappings, text keys, precedence on code 116, passthrough") {
    val in = Seq("93", "211", "45", "116", "150", "mamila_matamouk",
      "budu_tasi", "999", "babuti", "777").toDF("v")
    val out = in.select(col("v"), Recodes.recodeSpecies(col("v")).as("r"))
      .as[(String, String)].collect().toMap
    assert(out("93") == "1")
    assert(out("211") == "2")
    assert(out("45") == "5")
    // 116 is listed under both "11" and "31" — case_when's first arm wins
    assert(out("116") == "11")
    assert(out("150") == "31")
    assert(out("mamila_matamouk") == "18")
    assert(out("budu_tasi") == "58")
    assert(out("999") == "300")
    assert(out("babuti") == "300")
    assert(out("777") == "777") // unmapped passes through
  }

  test("gear / habitat / food maps") {
    val in = Seq("1", "8", "9", "rompun", "deep", "nain_rua").toDF("v")
    def m(c: org.apache.spark.sql.Column) =
      in.select(col("v"), c).as[(String, String)].collect().toMap
    val g = m(Recodes.recodeGear(col("v")))
    assert(g("1") == "GN" && g("8") == "SN" && g("9") == "9")
    val h = m(Recodes.recodeHabitat(col("v")))
    assert(h("rompun") == "2" && h("deep") == "3")
    val f = m(Recodes.recodeFoodOrSale(col("v")))
    assert(f("nain_rua") == "both")
  }

  test("null-target recodes: LOR site and boat type 3 become null") {
    val in = Seq(("LOR", "3"), ("COM", "1"), ("5", "2")).toDF("site", "boat")
    val out = in.select(
      Recodes.recodeSite(col("site")).as("s"),
      Recodes.recodeBoat(col("boat")).as("b"))
      .as[(Option[String], Option[String])].collect().toSet
    assert(out == Set((None, None), (Some("7"), Some("1")), (Some("5"), Some("2"))))
  }

  test("cleanStep1 recodes the raw v2 columns and tolerates missing ones") {
    val df = Seq(("AUTOMATIC", "2", "rompun", "LOR", "3"))
      .toDF("trip_group/mesh_size", "trip_group/gear_type",
        "trip_group/habitat_boat", "landing_site_name", "trip_group/boat_type")
    val r = Recodes.cleanStep1(df).collect().head
    assert(r.getString(0) == "4")      // mesh AUTOMATIC → 4
    assert(r.getString(1) == "HL")     // gear 2 → HL
    assert(r.getString(2) == "2")      // habitat rompun → 2
    assert(r.isNullAt(3))              // site LOR → null
    assert(r.isNullAt(4))              // boat 3 → null
    // a frame missing the columns passes through untouched
    val slim = Seq(("x", 1)).toDF("a", "b")
    assert(Recodes.cleanStep1(slim).collect().head == slim.collect().head)
  }

  test("recodeLegacySpecies hits every *species column of a wide frame") {
    val df = Seq(("93", "116", "no"))
      .toDF("species_group.0.species", "species_group.1.species", "other")
    val r = Recodes.recodeLegacySpecies(df).collect().head
    assert(r.getString(0) == "1")
    assert(r.getString(1) == "11")
    assert(r.getString(2) == "no")
  }
}
