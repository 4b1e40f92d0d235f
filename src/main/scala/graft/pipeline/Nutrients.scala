package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Exact

/** Nutrient conversion surface (SURVEY §3.4's estimation tail):
  * per-taxon nutritional values and catch→nutrient-mass→RDI scaling,
  * from `/root/reference/R/calculate-nutrients.R:24-141`,
  * `R/format-public-data.R:597-611` (summarise_nutrients) and
  * `:1177-1205` (get_period_rdi), RDI constants from
  * `inst/conf.yml:86-97`.
  *
  * The nutrients table is DIMENSION-sized (one row per taxon code, a
  * few hundred at most): the whole computation — medians included —
  * runs on a frame that broadcasts, and the per-catch joins against it
  * are broadcast hash joins. Plain exact `percentile` is therefore the
  * right median here (no SortPercentile machinery needed; this frame
  * never approaches executor memory).
  */
object Nutrients {

  /** (wide `_mu` column, long nutrient name, RDI grams/person/day) in
    * the reference's selection order. */
  val Table: Seq[(String, String, Double)] = Seq(
    ("Selenium_mu", "selenium", 0.000026),
    ("Zinc_mu", "zinc", 0.0049),
    ("Protein_mu", "protein", 46.0),
    ("Omega_3_mu", "omega3", 2.939),
    ("Calcium_mu", "calcium", 1.0),
    ("Iron_mu", "iron", 0.0294),
    ("Vitamin_A_mu", "vitaminA", 0.0005))

  val MuCols: Seq[String] = Table.map(_._1)

  /** Predicted FLY (flying fish) values hard-coded in the reference
    * (`calculate-nutrients.R:59-69`) — its FishBase row is unusable. */
  val FlyRow: Map[String, Double] = Map(
    "Selenium_mu" -> 40.6528, "Zinc_mu" -> 1.44887,
    "Protein_mu" -> 17.09566, "Omega_3_mu" -> 0.2460711,
    "Calcium_mu" -> 423.1434, "Iron_mu" -> 2.109762,
    "Vitamin_A_mu" -> 25.77763)

  /** `get_nutrients_table` (`calculate-nutrients.R:24-106`): FishBase
    * species estimates deduplicated per (code, species), invertebrate
    * codes replaced by the FAO composition table, the FLY override
    * appended; units converted to grams-per-gram (mg/100g ÷ 1e3·1e2,
    * μg/100g ÷ 1e6·1e2, g/100g ÷ 1e2); per-code MEDIAN; remaining
    * nulls backfilled with the column median.
    *
    * `fishEstimates`: (interagency_code, SpecCode, Selenium, Zinc,
    * Protein, Omega3, Calcium, Iron, VitaminA, <orderCol>). The
    * reference keeps the FIRST row per (code, species) in frame order —
    * order is not a relational concept, so `orderCol` makes the pick
    * explicit (min_by). `faoComposition`: (interagency_code, *_mu). */
  def nutrientsTable(fishEstimates: DataFrame, faoComposition: DataFrame,
                     orderCol: String): DataFrame = {
    val rawCols = Seq("Selenium" -> "Selenium_mu", "Zinc" -> "Zinc_mu",
      "Protein" -> "Protein_mu", "Omega3" -> "Omega_3_mu",
      "Calcium" -> "Calcium_mu", "Iron" -> "Iron_mu",
      "VitaminA" -> "Vitamin_A_mu")
    val fish = fishEstimates
      .filter(rawCols.map { case (c, _) => col(c).isNotNull }.reduce(_ && _)) // na.omit
      .groupBy(col("interagency_code"), col("SpecCode"))
      .agg(
        min_by(col(rawCols.head._1), col(orderCol)).as(rawCols.head._2),
        rawCols.tail.map { case (c, mu) => min_by(col(c), col(orderCol)).as(mu) }: _*)
      .select(col("interagency_code") +: MuCols.map(col): _*)
      // invertebrate codes come from the FAO table instead
      .join(faoComposition.select("interagency_code").distinct(),
        Seq("interagency_code"), "left_anti")
      .unionByName(faoComposition.select(col("interagency_code") +: MuCols.map(col): _*))
      .filter(col("interagency_code") =!= "FLY")
      .unionByName(fishEstimates.sparkSession.range(1)
        .select(lit("FLY").as("interagency_code") +:
          MuCols.map(c => lit(FlyRow(c)).as(c)): _*))
    val converted = fish.select(
      col("interagency_code") +:
        MuCols.map { c =>
          val x = col(c)
          (c match {
            case "Zinc_mu" | "Calcium_mu" | "Iron_mu" => x / 1000.0 / 100.0
            case "Selenium_mu" | "Vitamin_A_mu" => x / 1000000.0 / 100.0
            case _ => x / 100.0 // Omega_3_mu, Protein_mu (g/100g)
          }).as(c)
        }: _*)
    val perCode = converted.groupBy(col("interagency_code"))
      .agg(
        percentile(col(MuCols.head), lit(0.5)).as(MuCols.head),
        MuCols.tail.map(c => percentile(col(c), lit(0.5)).as(c)): _*)
    // replace_na with the column median OVER the per-code medians
    val globals = perCode.groupBy()
      .agg(
        percentile(col(MuCols.head), lit(0.5)).as(s"__g_${MuCols.head}"),
        MuCols.tail.map(c => percentile(col(c), lit(0.5)).as(s"__g_$c")): _*)
    perCode.crossJoin(broadcast(globals))
      .select(col("interagency_code") +:
        MuCols.map(c => coalesce(col(c), col(s"__g_$c")).as(c)): _*)
  }

  /** `summarise_nutrients` (`format-public-data.R:597-611`): catch (kg)
    * per (date_bin_start, grouped_taxa) joined to the nutrient table →
    * nutrient mass `mu · (catch·1000) / 1000` per nutrient, long-form
    * wide columns named by the lowercase nutrient. */
  def summariseNutrients(taxaEstimations: DataFrame,
                         nutrients: DataFrame): DataFrame =
    taxaEstimations
      .join(broadcast(nutrients
        .withColumnRenamed("interagency_code", "grouped_taxa")),
        Seq("grouped_taxa"), "left")
      .select(Seq(col("date_bin_start"), col("grouped_taxa"), col("catch")) ++
        Table.map { case (mu, name, _) =>
          (col(mu) * (col("catch") * 1000.0) / 1000.0).as(name)
        }: _*)

  /** `get_period_rdi` (`format-public-data.R:1177-1205`): long-form
    * (nutrient, nut_supply) → individuals-fed-per-day equivalent
    * `nut_supply · 1000 / unit_days / RDI(nutrient)`. */
  def periodRdi(nutrientsLong: DataFrame, unitDays: Double): DataFrame = {
    val rdi = Table.tail.foldLeft(
      when(col("nutrient") === Table.head._2, lit(Table.head._3))) {
      case (acc, (_, name, g)) => acc.when(col("nutrient") === name, lit(g))
    }
    nutrientsLong.withColumn("nut_rdi",
      col("nut_supply") * 1000.0 / lit(unitDays) / rdi)
  }

  /** Wide→long unpivot of the 7 nutrient-mass columns. */
  def toLong(wide: DataFrame, keep: Seq[String]): DataFrame =
    wide.select(keep.map(col) :+
      explode(map(Table.flatMap { case (_, name, _) =>
        Seq(lit(name), col(name).cast("double"))
      }: _*)).as(Seq("nutrient", "nut_supply")): _*)

  /** `get_nutrients_proportions` (`format-public-data.R:613-626`): the
    * median over rows of each nutrient's percentage of the row's catch.
    * One single-row aggregate (the estimates frame is month × taxa
    * grain — always tiny next to the fact tables it derives from). */
  def nutrientProportions(estimates: DataFrame): DataFrame = {
    def share(n: String) = percentile(col(n) / col("catch") * 100.0, lit(0.5)).as(n)
    estimates.agg(share(Table.head._2), Table.tail.map { case (_, n, _) => share(n) }: _*)
  }

  /** `fill_missing_group` (`format-public-data.R:627-685`): the
    * catch-all `taxa` bucket (MZZ in the reference — no usable FishBase
    * nutrient row) gets its nutrient columns recomputed as catch ×
    * median-proportion for date bins at/after `since`; all other rows
    * pass through. The proportions frame is ONE row — broadcast
    * cross join, no shuffle, no per-row lookup. */
  def fillMissingGroup(estimates: DataFrame, proportions: DataFrame,
                       taxa: String = "MZZ", since: String = "2018-04-01"): DataFrame = {
    val p = broadcast(proportions.select(Table.map { case (_, n, _) =>
      col(n).as(s"__p_$n") }: _*))
    val backfilled = col("grouped_taxa") === taxa &&
      col("date_bin_start") >= to_date(lit(since))
    estimates.crossJoin(p)
      .select(estimates.columns.toSeq.map {
        case n if Table.exists(_._2 == n) =>
          when(backfilled, col("catch") * col(s"__p_$n") / 100.0)
            .otherwise(col(n)).as(n)
        case c => col(c)
      }: _*)
  }

  /** `aggregate_nutrients` (`format-public-data.R:686-698`): na.rm sums
    * of the 7 nutrient columns per date bin (an all-null group is 0,
    * as in R), unpivoted long. Sums ride the scaled-long exact path at
    * 1e12 resolution — nutrient masses sit orders of magnitude below
    * the micros scale the fact-side sums use, and the overflow guard
    * keeps the finer scale safe. */
  val AggScale = 1e12
  def aggregateNutrients(filled: DataFrame): DataFrame = {
    def s(n: String) = coalesce(Exact.lsumAt(col(n), AggScale), lit(0.0)).as(n)
    val agg = filled.groupBy(col("date_bin_start"))
      .agg(s(Table.head._2), Table.tail.map { case (_, n, _) => s(n) }: _*)
    toLong(agg, Seq("date_bin_start"))
  }
}
