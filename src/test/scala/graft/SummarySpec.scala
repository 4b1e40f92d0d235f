package graft

import graft.pipeline.{Export, SummaryData}
import org.apache.spark.sql.functions._

/** Unit surface for the portal summary/export compositions
  * (`R/format-public-data.R:783-960`, `R/export.R:93-248`); the
  * heavyweight compositions are oracle-gated by q83–q85. */
class SummarySpec extends SparkSpec {
  import spark.implicits._

  test("areaOf: arm order — north site wins over null municipality, Atauro second") {
    val df = Seq(
      (Some("Dili"), Some("X")),          // north municipality
      (None, Some("Com")),                // north SITE with null municipality
      (Some("Atauro"), Some("Com")),      // site arm fires before Atauro
      (Some("Atauro"), Some("Y")),        // Atauro island
      (None, Some("Y")),                  // null -> null
      (Some("Viqueque"), Some("Y"))       // everything else -> South
    ).toDF("municipality", "landing_site")
      .select(SummaryData.areaOf($"municipality", $"landing_site").as("area"))
    assert(df.as[Option[String]].collect().toSeq == Seq(
      Some("North Coast"), Some("North Coast"), Some("North Coast"),
      Some("Atauro island"), None, Some("South Coast")))
  }

  test("fishGroupOf: SUR resolves to Large demersals (first matching arm)") {
    val out = Seq("SUR", "TUN", "RAX", "ZZZ").toDF("t")
      .select(SummaryData.fishGroupOf($"t").as("g"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("Large demersals"), Some("Large pelagics"),
      Some("Small pelagics"), None))
  }

  test("nutrientsCatchAverage: zero-zinc trips dropped, RDI order descending") {
    val rows = Seq(
      // trip 1: protein-heavy
      (1L, 0.1, 0.002, 20.0, 0.5, 0.3, 0.01, 0.02),
      (1L, 0.1, 0.002, 20.0, 0.5, 0.3, 0.01, 0.02),
      // trip 2: zero zinc -> dropped entirely
      (2L, 9.9, 0.0, 99.0, 9.9, 9.9, 9.9, 9.9)
    ).toDF("trip_id", "Selenium_mu", "Zinc_mu", "Protein_mu", "Omega_3_mu",
      "Calcium_mu", "Iron_mu", "Vitamin_A_mu")
    val out = SummaryData.nutrientsCatchAverage(rows)
      .as[(String, Double)].collect()
    assert(out.length == 7)
    assert(out.map(_._1).toSet == Set("Selenium", "Zinc", "Protein",
      "Omega-3", "Calcium", "Iron", "Vitamin A"))
    // trip 2 dropped: selenium mean is trip 1's sum (0.2), not 9.9-scale
    val sel = out.toMap.apply("Selenium")
    assert(math.abs(sel - 0.2 / 0.000026) < 1e-6)
    assert(out.map(_._2).sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("renameOntology: sequential substring renames including the gear hazard") {
    val df = Seq((1.0, "a", 2.0, "b", "c"))
      .toDF("catch_price", "municipality", "landing_catch",
        "catch_preservation", "propulsion_gear")
    assert(Export.renameOntology(df).columns.toSeq == Seq(
      "revenue", "region", "landing_weight",
      "conservation_place", "propulsion_gear_type"))
  }

  test("labelTaxaGroups: unique taxa per group, sorted") {
    val df = Seq(
      ("TUN", "Large pelagics"), ("CGX", "Large pelagics"),
      ("TUN", "Large pelagics"), ("RAX", "Small pelagics"),
      ("ZZZ", null)
    ).toDF("catch_taxon", "fish_group")
    val out = Export.labelTaxaGroups(df)
      .as[(String, Seq[String])].collect().toMap
    assert(out("Large pelagics") == Seq("CGX", "TUN"))
    assert(out("Small pelagics") == Seq("RAX"))
    assert(out.size == 2)
  }

  test("happinessMonthly: exact monthly means per municipality") {
    val df = Seq(
      ("Dili", "2024-01-05", 4.0), ("Dili", "2024-01-20", 2.0),
      ("Dili", "2024-02-01", 5.0))
      .toDF("municipality", "landing_date", "happiness")
      .withColumn("landing_date", to_date($"landing_date"))
    val out = SummaryData.happinessMonthly(df)
      .as[(String, java.sql.Date, Double)].collect()
      .map(r => r._2.toString -> r._3).toMap
    assert(out("2024-01-01") == 3.0 && out("2024-02-01") == 5.0)
  }
}
