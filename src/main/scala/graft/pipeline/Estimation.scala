package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Exact._

/** Estimation composition (SURVEY §3.4,
  * `/root/reference/R/estimate-catch.R:487-613`): municipal model
  * results rolled up to national estimates, and the per-taxa
  * redistribution of the national total by taxa catch shares.
  *
  * The municipal frames are month × municipality × (taxa) grain —
  * thousands of rows at most — so every aggregate here is exact
  * (decimal-routed sums/means, plain exact percentile for the median)
  * and the join side always broadcasts. R's two sum flavors are
  * replicated: `na.rm = TRUE` (all-null group → 0) for the aggregated
  * half, null-PROPAGATING (any null → null, R's default) for the taxa
  * half and the proportion denominators.
  */
object Estimation {

  /** R `sum(x)` without na.rm: any null in the group → null, empty
    * group → 0. */
  private def rsum(c: org.apache.spark.sql.Column) =
    when(count(c) === count(lit(1)), coalesce(dsum(c), lit(0.0)))

  /** `get_national_estimates` aggregated half (`:488-507`): means of
    * the per-landing columns, na.rm sums of the totals, exact median
    * of price_kg across municipalities. */
  def nationalAggregated(municipalAgg: DataFrame): DataFrame =
    municipalAgg
      .groupBy(col("period"), col("month"), col("landing_period"))
      .agg(
        davg(col("landing_catch_price")).as("landing_catch_price"),
        davg(col("n_landings_per_boat")).as("n_landings_per_boat"),
        davg(col("landing_catch")).as("landing_catch"),
        coalesce(dsum(col("catch_price")), lit(0.0)).as("catch_price"),
        coalesce(dsum(col("catch")), lit(0.0)).as("catch"),
        percentile(col("price_kg"), lit(0.5)).as("price_kg"))

  /** `get_national_estimates` taxa half (`:509-527`): as above per
    * grouped_taxa, except the totals use R's null-propagating sum and
    * there is no price median. */
  def nationalTaxa(municipalTaxa: DataFrame): DataFrame =
    municipalTaxa
      .groupBy(col("period"), col("month"), col("landing_period"), col("grouped_taxa"))
      .agg(
        davg(col("landing_catch_price")).as("landing_catch_price"),
        davg(col("n_landings_per_boat")).as("n_landings_per_boat"),
        davg(col("landing_catch")).as("landing_catch"),
        rsum(col("catch_price")).as("catch_price"),
        rsum(col("catch")).as("catch"))

  /** `model_taxa_porportion` (`:583-613`): each taxon's share of the
    * taxa-summed catch per landing period, re-applied to the aggregated
    * model's total — so the per-taxa estimates sum exactly to the
    * national estimate. The per-period denominator propagates nulls
    * like R's bare `sum`; the window partitions by landing period
    * (month grain — a few taxa rows per partition at any scale).
    *
    * `aggregated`: (period, landing_period, catch, …); `taxa`:
    * (period, landing_period, grouped_taxa, catch, …). Output: taxa
    * columns with `catch` replaced by the redistributed estimate. */
  def taxaProportion(aggregated: DataFrame, taxa: DataFrame): DataFrame = {
    val tot = aggregated.select(col("period"), col("landing_period"),
      col("catch").as("tot_catch"))
    val w = Window.partitionBy(col("landing_period"))
    taxa
      .withColumn("tot_catch_taxa",
        when(count(col("catch")).over(w) === count(lit(1)).over(w),
          dsumOver(col("catch"), w)))
      .withColumn("taxa_prop", col("catch") / col("tot_catch_taxa") * 100.0)
      .drop("catch", "tot_catch_taxa")
      .join(broadcast(tot), Seq("landing_period", "period"), "left")
      .withColumn("catch", col("taxa_prop") / 100.0 * col("tot_catch"))
      .drop("taxa_prop", "tot_catch")
  }

  /** `fill_missing_regions` (`:556-580`): per tracker imei, the modal
    * municipality of its trips backfills trips with no municipality.
    * R takes the first row after `arrange(desc(n))` — a tie is frame
    * order there; here ties break on the smaller municipality name
    * (explicit total order, documented divergence). */
  def fillMissingRegions(trips: DataFrame): DataFrame = {
    val imeiRegions = trips
      .filter(col("tracker_imei").isNotNull && col("municipality").isNotNull)
      .groupBy(col("tracker_imei"), col("municipality"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("tracker_imei"))
      .agg(min_by(col("municipality"), struct((-col("__n")).as("a"), col("municipality")))
        .as("municipality_fill"))
    trips.join(imeiRegions, Seq("tracker_imei"), "left")
      .withColumn("municipality",
        coalesce(col("municipality"), col("municipality_fill")))
      .drop("municipality_fill")
  }
}
