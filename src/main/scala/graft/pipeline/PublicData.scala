package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.functions.Dates

/** The format-public-data entry point (SURVEY §3.3,
  * `/root/reference/R/format-public-data.R:27-284`): anonymized trip
  * ids, the trips/catch projections, and the recorded-activity rollups
  * at the four reporting grains.
  */
object PublicData {

  /** md5 anonymized trip id over (landing_id, tracker_trip_id) — the
    * reference hashes R's `paste` output, where a missing id prints as
    * the literal "NA"; replicated exactly for parity
    * (`R/format-public-data.R:312-319`). */
  def withTripId(merged: DataFrame): DataFrame =
    merged.withColumn("trip_id",
      md5(concat_ws(" ",
        coalesce(col("landing_id").cast("string"), lit("NA")),
        coalesce(col("tracker_trip_id").cast("string"), lit("NA")))))

  /** One recorded-activity rollup per grain: day / Sunday-week / month /
    * year (`R/format-public-data.R:363-457`). `grain` ∈
    * {"day","week","month","year"}. */
  def summariseTrips(trips: DataFrame, grain: String, dateCol: String = "landing_date"): DataFrame = {
    val bin = grain match {
      case "week" => Dates.floorWeekSunday(col(dateCol))
      case g      => to_date(date_trunc(g, col(dateCol)))
    }
    trips
      .groupBy(bin.as("period_start"))
      .agg(
        countDistinct(col("trip_id")).as("n_trips"),
        lcount(col("landing_id")).as("n_landings"),
        lcount(col("tracker_trip_id")).as("n_tracks"),
        dsum(col("weight_kg")).as("catch_kg"),
        dsum(col("total_catch_value")).as("catch_value"))
  }

  /** All four grains stacked with a grain tag — the reference writes
    * one artifact per grain; a single stacked frame partition-prunes the
    * same way and shares one scan. */
  def allGrains(trips: DataFrame): DataFrame =
    Seq("day", "week", "month", "year").map { g =>
      summariseTrips(trips, g).withColumn("grain", lit(g))
    }.reduce(_.unionByName(_))

  /** Tinytest gate 4: anonymized trip_id unique. */
  def gate(publicTrips: DataFrame): Boolean =
    publicTrips.groupBy(col("trip_id")).count().filter(col("count") > 1).isEmpty

  /** `add_calculated_fields` (`R/format-public-data.R:289-327`): the
    * reference rowwise-maps two R closures over each trip's NESTED
    * catch frame — n_taxa = distinct non-null taxa excluding the
    * no-catch marker, taxa = sorted non-null taxa pasted with " ".
    * Here both are higher-order array expressions (transform / filter /
    * array_distinct / array_sort / array_join): no explode, row count
    * unchanged, fully codegen'd — the Spark shape of "purrr::map over a
    * nested column". A null nested array yields null fields (R's NULL →
    * NA branch). */
  def addCalculatedFields(nested: DataFrame, itemsCol: String,
                          taxonField: String, noCatch: String = "0"): DataFrame = {
    val taxa = expr(s"transform(`$itemsCol`, x -> x.`$taxonField`)")
    nested
      .withColumn("n_taxa",
        when(col(itemsCol).isNull, lit(null))
          .otherwise(size(array_distinct(filter(taxa,
            t => t.isNotNull && t =!= lit(noCatch)))).cast("long")))
      .withColumn("taxa",
        when(col(itemsCol).isNull, lit(null))
          .otherwise(array_join(array_sort(filter(taxa, _.isNotNull)), " ")))
  }

  /** The CPUE block of `get_summary_data` (`R/format-public-data.R:
    * 862-900`): per-landing firsts + summed catch (g→kg), cpue =
    * (catch_kg / trip_length) / n_fishers, exact median per
    * (municipality, gear), na.omit. R guards `is.infinite(cpue)` → NA
    * after dividing; expressed algebraically as a zero-denominator
    * predicate instead, because double division by zero is engine-
    * defined (Spark nulls, IEEE engines yield ±Inf) — same rows null
    * out (0/0's NaN is removed by R's na.rm just like our null).
    * Two shuffles: to the landing grain (firsts and the sum share one
    * exchange), then to the reporting pair. `ordCol` pins R's
    * frame-order `first` to an explicit total order. */
  def cpueMedians(rows: DataFrame, ordCol: String): DataFrame = {
    def fst(c: String) = min_by(col(c), col(ordCol)).as(c)
    val perLanding = rows
      .filter(col("landing_id").isNotNull && col("catch").isNotNull)
      .groupBy(col("landing_id"))
      .agg(fst("municipality"), fst("gear"), fst("trip_length"), fst("n_fishers"),
        dsum(col("catch")).as("landing_catch"))
    val cpue = (col("landing_catch") / 1000.0 / col("trip_length")) / col("n_fishers")
    perLanding
      .withColumn("cpue",
        when(col("trip_length") =!= 0.0 && col("n_fishers") =!= 0.0, cpue))
      .groupBy(col("municipality"), col("gear"))
      .agg(percentile(col("cpue"), lit(0.5)).as("cpue"))
      .na.drop()
  }

  // ------------------------------------------------------------------
  // Estimation rollups (summarise_estimations,
  // `R/format-public-data.R:459-595`)
  // ------------------------------------------------------------------

  /** Model-estimation rollup with current-period proration: monthly
    * predictions completed over a month spine (floor-year(min) →
    * ceiling-year(max)), the month containing `today` scaled by
    * elapsed/period-length (the reference presents only
    * estimates-to-date for the running month), future months dropped,
    * then floored to `binUnit` and aggregated (means of the per-landing
    * columns, sums of the totals; `price_kg` mean only in the
    * ungrouped/national variant). Sub-month bins return an EMPTY frame
    * — the reference `sample_n(0)`s them (`:585-592`).
    *
    * Divergence note (documented): the reference computes
    * `current_period` / `period_length` via row-order `lead()` on the
    * completed frame — well-defined only for the strictly-monthly
    * national frame. We derive both from the calendar
    * (`add_months(date, 1)`), which is identical there and also
    * well-defined for taxa/municipal frames where several rows share a
    * month. `today` is an explicit parameter — a pipeline that reads
    * the wall clock inside the engine is untestable and non-replayable.
    *
    * Input: (landing_period [month-grain date], [taxaCol], landing_catch_price,
    * landing_catch, n_landings_per_boat, catch_price, catch, [price_kg]). */
  def summariseEstimations(predictions: DataFrame, binUnit: String,
                           today: String,
                           taxaCol: Option[String] = None): DataFrame = {
    val preds = predictions.withColumnRenamed("landing_period", "date_bin_start")
    val spine = preds
      .agg(min(col("date_bin_start")).as("__mn"), max(col("date_bin_start")).as("__mx"))
      .select(explode(sequence(
        trunc(col("__mn"), "year"),
        when(col("__mx") === trunc(col("__mx"), "year"), col("__mx"))
          .otherwise(add_months(trunc(col("__mx"), "year"), 12)),
        expr("interval 1 month"))).as("date_bin_start"))
    val td = to_date(lit(today))
    val monthEnd = add_months(col("date_bin_start"), 1)
    val current = td >= col("date_bin_start") && td < monthEnd
    val elapsed = (datediff(td, col("date_bin_start")) + 1).cast("double")
    val periodLen = datediff(monthEnd, col("date_bin_start")).cast("double")
    def prorate(c: String) = when(current, col(c) * elapsed / periodLen)
      .otherwise(col(c)).as(c)
    val standardized = spine
      .join(preds, Seq("date_bin_start"), "left")
      .withColumn("__elapsed", elapsed)
      .withColumn("n_landings_per_boat", prorate("n_landings_per_boat"))
      .withColumn("catch_price", prorate("catch_price"))
      .withColumn("catch", prorate("catch"))
      .filter(col("__elapsed") > 0)
      .withColumn("date_bin_start",
        binUnit match {
          case "week" => Dates.floorWeekSunday(col("date_bin_start"))
          case u      => to_date(date_trunc(u, col("date_bin_start")))
        })
    val keys = "date_bin_start" +: taxaCol.toSeq
    val keyed = taxaCol.foldLeft(standardized) { (df, t) => df.filter(col(t).isNotNull) }
    val base = Seq(
      davg(col("landing_catch_price")).as("landing_catch_price"),
      davg(col("landing_catch")).as("landing_catch"),
      // R sum(na.rm=TRUE) of an all-NA group is 0, not NA
      coalesce(dsum(col("n_landings_per_boat")), lit(0.0)).as("n_landings_per_boat"),
      coalesce(dsum(col("catch_price")), lit(0.0)).as("catch_price"),
      coalesce(dsum(col("catch")), lit(0.0)).as("catch"))
    val aggs = if (taxaCol.isEmpty) base :+ davg(col("price_kg")).as("price_kg") else base
    val binned = keyed.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    if (Seq("day", "week").contains(binUnit)) binned.limit(0) else binned
  }

  // ------------------------------------------------------------------
  // Municipal splits (`R/format-public-data.R:64-159`)
  // ------------------------------------------------------------------

  /** Recorded (not modelled) municipal monthly activity
    * (`:81-127`): per landing — first municipality/month/price/fuel and
    * summed catch; per (municipality, month) — summed price, summed
    * catch in tonnes, mean fuel; zeros nulled (a month with no recorded
    * price/catch/fuel shows as missing, not 0). */
  def municipalRecorded(landings: DataFrame, catchRows: DataFrame): DataFrame = {
    val perLanding = landings
      .select(col("landing_id"), col("municipality"),
        to_date(date_trunc("month", col("landing_date"))).as("date_bin_start"),
        col("catch_price"), col("fuel"))
      .join(catchRows.groupBy(col("landing_id"))
          .agg(coalesce(dsum(col("catch")), lit(0.0)).as("__catch")),
        Seq("landing_id"), "left")
    val zeroNull = (c: Column) => when(c === 0.0, lit(null)).otherwise(c)
    perLanding
      .groupBy(col("municipality"), col("date_bin_start"))
      .agg(
        coalesce(dsum(col("catch_price")), lit(0.0)).as("__rp"),
        (coalesce(dsum(col("__catch")), lit(0.0)) / 1000.0).as("__rc"),
        davg(col("fuel")).as("__fuel"))
      .select(col("municipality"), col("date_bin_start"),
        zeroNull(col("__rp")).as("recorded_catch_price"),
        zeroNull(col("__rc")).as("recorded_catch"),
        zeroNull(col("__fuel")).as("fuel"))
  }

  /** Municipal model estimates joined with recorded activity
    * (`:128-133`): the models' monthly frame (one row per municipality
    * × month) left-joined to [[municipalRecorded]]. */
  def municipalAggregated(municipalModels: DataFrame,
                          recorded: DataFrame): DataFrame =
    municipalModels
      .withColumnRenamed("landing_period", "date_bin_start")
      .join(recorded, Seq("municipality", "date_bin_start"), "left")

  // ------------------------------------------------------------------
  // JSON series shape (jsonify_indicators, `:1094-1138`)
  // ------------------------------------------------------------------

  /** The dashboard series export: (habitat, gear) groups with > `minN`
    * rows, the selected metric's mean rounded to 3, gears ordered by
    * value inside each habitat and habitats ordered by their summed
    * values — emitted as one (name, data) JSON row per habitat, `data`
    * a [{x: gear, y: value}] array. A DataFrame of JSON rows keeps the
    * export writable by any sink (the reference materializes nested R
    * lists; the series shape is identical). */
  def jsonifyIndicators(df: DataFrame, valueCol: String, minN: Long = 50): DataFrame = {
    val grouped = df
      .groupBy(col("habitat"), col("gear"))
      .agg(round(davg(col(valueCol)), 3).as("y"), count(lit(1)).as("n"))
      .filter(col("n") > minN)
    val habitatRank = grouped.groupBy(col("habitat"))
      .agg(dsum(col("y")).as("__hsum"))
    grouped.join(habitatRank, Seq("habitat"))
      .withColumn("__pair", struct(col("y"), col("gear")))
      .groupBy(col("habitat"), col("__hsum"))
      .agg(sort_array(collect_list(col("__pair")), asc = false).as("__pairs"))
      .select(col("habitat").as("name"), col("__hsum"),
        to_json(expr("transform(__pairs, p -> struct(p.gear as x, p.y as y))")).as("data"))
      .orderBy(col("__hsum").desc, col("name"))
      .drop("__hsum")
  }
}
