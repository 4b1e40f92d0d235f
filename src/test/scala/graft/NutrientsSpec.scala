package graft

import graft.pipeline.Nutrients
import org.apache.spark.sql.functions._

/** Unit surface of the nutrient table construction
  * (`R/calculate-nutrients.R:24-106`): FAO replacement, FLY override,
  * unit conversion, per-code medians and NA backfill. */
class NutrientsSpec extends SparkSpec {
  import spark.implicits._

  private def fish = Seq(
    // code, spec, Se, Zn, Pr, Om, Ca, Fe, VA, ord
    ("COD", 1L, 40.0, 2.0, 18.0, 0.5, 100.0, 1.0, 30.0, 1L),
    ("COD", 1L, 99.0, 9.0, 99.0, 9.0, 999.0, 9.0, 99.0, 2L), // dup key: ord 1 wins
    ("COD", 2L, 60.0, 4.0, 20.0, 1.5, 300.0, 3.0, 50.0, 3L),
    ("OCT", 1L, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 4L),      // replaced by FAO
    ("FLY", 1L, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 5L),      // replaced by the override
    ("BAD", 1L, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, Double.NaN, 6L)
  ).toDF("interagency_code", "SpecCode", "Selenium", "Zinc", "Protein",
      "Omega3", "Calcium", "Iron", "VitaminA", "ord")
    .withColumn("VitaminA", when(isnan($"VitaminA"), lit(null)).otherwise($"VitaminA"))

  private def fao = Seq(
    ("OCT", 30.0, 1.5, 16.0, 0.25, 350.0, 2.5, null.asInstanceOf[java.lang.Double])
  ).toDF("interagency_code", "Selenium_mu", "Zinc_mu", "Protein_mu",
      "Omega_3_mu", "Calcium_mu", "Iron_mu", "Vitamin_A_mu")

  test("nutrients table: dedup-by-order, FAO replacement, FLY override, conversion, backfill") {
    val nt = Nutrients.nutrientsTable(fish, fao, "ord").cache()
    val codes = nt.select($"interagency_code").as[String].collect().toSet
    assert(codes == Set("COD", "OCT", "FLY")) // BAD dropped by na.omit
    val cod = nt.filter($"interagency_code" === "COD").head()
    // median of specs 1 (ord-1 row, not ord-2) and 2, converted:
    // Selenium μg/100g: (40+60)/2 / 1e6 / 100
    assert(math.abs(cod.getAs[Double]("Selenium_mu") - 50.0 / 1e6 / 100) < 1e-18)
    // Protein g/100g: (18+20)/2 / 100
    assert(math.abs(cod.getAs[Double]("Protein_mu") - 19.0 / 100) < 1e-15)
    // Zinc mg/100g: (2+4)/2 / 1e3 / 100
    assert(math.abs(cod.getAs[Double]("Zinc_mu") - 3.0 / 1e3 / 100) < 1e-15)
    val fly = nt.filter($"interagency_code" === "FLY").head()
    assert(math.abs(fly.getAs[Double]("Protein_mu") - 17.09566 / 100) < 1e-12)
    val oct = nt.filter($"interagency_code" === "OCT").head()
    assert(math.abs(oct.getAs[Double]("Calcium_mu") - 350.0 / 1e3 / 100) < 1e-15)
    // OCT's null Vitamin_A_mu backfilled with the column median
    assert(oct.getAs[Any]("Vitamin_A_mu") != null)
  }

  test("period RDI: named constants applied per nutrient") {
    val long = Seq(("protein", 46.0), ("selenium", 0.000026 * 30))
      .toDF("nutrient", "nut_supply")
    val out = Nutrients.periodRdi(long, unitDays = 30.0)
      .select($"nutrient", $"nut_rdi").as[(String, Double)].collect().toMap
    // protein: 46 g supply over 30 days at 46 g/day RDI = 1000/30 person-days
    assert(math.abs(out("protein") - 1000.0 / 30.0) < 1e-9)
    // selenium: exactly 1000 person-days by construction
    assert(math.abs(out("selenium") - 1000.0) < 1e-9)
  }
}
