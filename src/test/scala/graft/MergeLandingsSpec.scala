package graft

import graft.pipeline.MergeLandings

/** Cross-generation unification (`R/merge-landings.R:124-163`);
  * the composed path is oracle-gated by q86. */
class MergeLandingsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeVersions unifies drifted columns and applies the drop list") {
    val v1 = Seq((1L, 12.0, "H3x", "seluk__hakerek", "hand written"))
      .toDF("sid", "trip_group/fuel_used_L", "trip_group/Habitat_no_boat",
        "Tanba_sa_la_iha_ro_o_peskador_", "Seluk_hakerek_manualmente")
    val v2 = Seq((2L, 33.0, "G1y", "0"))
      .toDF("sid", "trip_group/Total_litru_mina_hir_e_ebe_gastu_ba_peska",
        "trip_group/habitat_no_boat", "reason_for_zero_boats")
    val v3 = Seq((3L, 44.0, "B2"))
      .toDF("sid", "trip_group/Total_litru_mina_hir_e_ebe_gastu_ba_peska",
        "trip_group/habitat_boat")
    val out = MergeLandings.mergeVersions(MergeLandings.tagAndUnion(v1, v2, v3))

    // unified columns present; every raw source column dropped
    val cols = out.columns.toSet
    assert(cols.contains("fuel_L") && cols.contains("trip_group/habitat") &&
      cols.contains("reason_no_activity"))
    assert(!cols.exists(_.contains("fuel_used")) &&
      !cols.exists(_.contains("Total_litru")) &&
      !cols.contains("reason_no_fishing") &&
      !cols.contains("habitat_no_boat"))

    val rows = out.select($"sid", $"fuel_L", $"`trip_group/habitat`",
        $"reason_no_activity", $"survey_version")
      .as[(Long, Option[Double], Option[String], Option[String], String)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows(1L) == ((1L, Some(12.0), Some("H"), Some("hand written"), "v1")))
    // v2: new fuel name wins; habitat falls back to first char of no-boat
    assert(rows(2L) == ((2L, Some(33.0), Some("G"), Some("0"), "v2")))
    // v3: habitat_boat passes through whole; no reason recorded
    assert(rows(3L) == ((3L, Some(44.0), Some("B2"), None, "v3")))
  }
}
