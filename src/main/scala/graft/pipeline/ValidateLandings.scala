package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Dates
import graft.stats.Outliers

/** The validate-landings entry point (SURVEY §3.1,
  * `/root/reference/R/validate-landings.R:21-338`): 15 per-dimension
  * validators, each a small dataflow producing
  * `(submission_id, cleanedValue…, alert_k)`, folded back onto the
  * landings by submission_id (J10), with the non-null alert codes
  * united into one '-'-separated string (empty → "0").
  *
  * Input contract (flat trip grain — SURVEY §4 keeps data exploded
  * through validation and nests once at the end):
  *   trips: submission_id, landing_date (date), submission_date (date),
  *     imei (string partial), duration_hrs, total_catch_value,
  *     boat_code, has_boat, gear_code, station_code, fisher_child,
  *     fisher_man, fisher_woman, habitat_code, mesh_size (string,
  *     inches), mesh_other (string), n_gleaners, fuel,
  *     conservation_code, happiness
  *   catchRows (exploded species×length grain): submission_id, line_no,
  *     species, n_individuals, weight_g
  *
  * Faithfulness notes (all verified against the reference source):
  *  - `validate_vessel_type` / `validate_gear_type`
  *    (`R/validation-functions.R:509-554`) guard their alerts with
  *    `isTRUE(vector)`, which is FALSE for any vector of length > 1 —
  *    so alerts 12/13/14/15 never fire on real data. We replicate that
  *    behavior (alert columns are literal nulls) and carry the joined
  *    vessel_type / gear_type columns, which is the part with effect.
  *  - `validate_fuel` (`:679-702`) third arm (`fuel > 0 & isFALSE(has_boat)`)
  *    is dead for the same reason; the negative-fuel and MAD-outlier
  *    arms are live. The MAD is computed over fuel ≥ 0 (the reference
  *    feeds negatives into log1p producing NaNs that R's quantiles
  *    ignore; engines disagree on ln(0), so we exclude them — the
  *    flagged set is identical because negative rows already carry 23).
  *  - The flags-sheet `unite` (`R/validate-landings.R:211-229`) covers
  *    imei, dates, duration, price-weight, vessel, gear, sites,
  *    n_fishers, habitat, mesh, gleaners — NOT fuel/conservation/
  *    happiness (fuel is cleaned but unflagged in the sheet).
  */
object ValidateLandings {

  final case class Config(
      maxTripHours: Double = 96.0,
      maxDelayDays: Int = 28,
      priceKgMin: Double = 0.25,
      priceKgMax: Double = 30.0,
      madK: Double = 2.5,
      priceCap: Double = 1500.0,
      meshLimitMm: Double = 500.0,
      kInd: Double = 2.5,
      kFishers: Double = 2.5,
      kGleaners: Double = 2.5,
      kFuel: Double = 2.5,
      /** Registry must be broadcast-sized; the suffix match is a
        * theta-join that degrades to a nested loop if it is not. */
      maxRegistryRows: Long = 100000L)

  // ------------------------------------------------------------------
  // Compact 5-validator demo fold (round-2 surface, kept for specs)
  // ------------------------------------------------------------------

  /** Alert 4/2: non-positive or over-cap duration; late submission. */
  def validateTemporal(df: DataFrame, cfg: Config): DataFrame =
    df.select(col("submission_id"),
      when(col("duration_hrs") <= 0.0 || col("duration_hrs") > cfg.maxTripHours, lit(4))
        .as("alert_duration"),
      when(datediff(to_date(col("submission_time")), col("landing_date")) > cfg.maxDelayDays
        || col("landing_date") < to_date(lit("2017-01-01")), lit(2))
        .as("alert_date"))

  /** Alert 5/6/7: IMEI suffix resolution against the device registry
    * (ST10 ladder: too short → 5, ambiguous → 6, no match → 7). */
  def validateImei(df: DataFrame, registry: DataFrame): DataFrame =
    df.select(col("submission_id"), col("imei"))
      .join(broadcast(registry), col("device_imei").endsWith(col("imei")), "left")
      .groupBy(col("submission_id"), col("imei"))
      .agg(count(col("device_imei")).as("n_matches"),
        min(col("device_imei")).as("imei_resolved"))
      .select(col("submission_id"), col("imei_resolved"),
        when(length(col("imei")) < 5, lit(5))
          .when(col("n_matches") > 1, lit(6))
          .when(col("n_matches") === 0, lit(7))
          .as("alert_imei"))

  /** Alert 8: MAD/LocScaleB outlier bound on catch weight per gear
    * (ST1, with the reference's no-op guards). */
  def validateCatch(df: DataFrame, cfg: Config): DataFrame =
    Outliers.flagOutliers(
      df.select(col("submission_id"), col("gear_code"), col("weight_kg")),
      keys = Seq("gear_code"), x = "weight_kg", k = cfg.madK)
      .select(col("submission_id"),
        when(col("is_outlier"), lit(8)).as("alert_catch"))

  /** Alert 17: price-per-kg ratio outside the configured band. */
  def validatePrice(df: DataFrame, cfg: Config): DataFrame =
    df.select(col("submission_id"),
      when(col("weight_kg") > 0.0 &&
        (col("total_catch_value") / col("weight_kg") < cfg.priceKgMin ||
          col("total_catch_value") / col("weight_kg") > cfg.priceKgMax), lit(17))
        .as("alert_price"))

  /** Alert 9: unknown gear code (dimension membership, J4+J13). */
  def validateGear(df: DataFrame, gearDim: DataFrame): DataFrame =
    df.select(col("submission_id"), col("gear_code"))
      .join(broadcast(gearDim.withColumn("__known", lit(1))), Seq("gear_code"), "left")
      .select(col("submission_id"),
        when(col("__known").isNull, lit(9)).as("alert_gear"))

  /** The compact J10 fold over the 5 demo validators. */
  def apply(landings: DataFrame, deviceRegistry: DataFrame, gearDim: DataFrame,
            cfg: Config = Config()): DataFrame = {
    val validators = Seq(
      validateTemporal(landings, cfg),
      validateImei(landings, deviceRegistry),
      validateCatch(landings, cfg),
      validatePrice(landings, cfg),
      validateGear(landings, gearDim))
    val folded = validators.foldLeft(landings) { (acc, v) =>
      acc.join(v.drop("imei"), Seq("submission_id"), "left")
    }
    val alertCols = Seq("alert_duration", "alert_date", "alert_imei",
      "alert_catch", "alert_price", "alert_gear")
    folded
      .withColumn("alert_number", Dates.uniteCodes(alertCols.map(col)))
      .withColumn("validated", col("alert_number") === "")
      .withColumn("weight_kg",
        when(col("alert_catch").isNotNull, lit(null)).otherwise(col("weight_kg")))
      .withColumn("total_catch_value",
        when(col("alert_price").isNotNull, lit(null)).otherwise(col("total_catch_value")))
      .drop(alertCols: _*)
  }

  // ------------------------------------------------------------------
  // Full 15-validator suite (reference parity)
  // ------------------------------------------------------------------

  /** The five global-LocScaleB columns (fishers ×3 → 18, gleaners →
    * 21, fuel → 23) bounded in ONE stacked histogram pass: the columns
    * (with their per-validator transforms) are exploded into
    * `(__col, __x)` rows and one grouped-by-name MAD computed — five
    * separate passes each pay a full scan plus ~10 small stages, and a
    * nested per-column fold multiplies plan subtrees combinatorially
    * (measured 40 s vs 2 s at sf0.1 for the fishers alone).
    *
    * `madBoundsLog1p` is called with k = 1 and each validator's k is
    * applied afterwards on the log scale (bounds = exp(med ± k·mad) − 1);
    * the MAD>0 / nonzero guard — encoded by `lower IS NOT NULL` — does
    * not depend on k, so the bounds are exactly the per-column calls'.
    *
    * Output: ONE row with `__lo_<name>` / `__hi_<name>` per column,
    * already back-transformed (null when the no-op guard fired). The
    * exp() back-transform happens HERE, on one row, NOT per trip row:
    * leaving `exp(med ± k·mad)` to the consumers put ~24 exp calls into
    * the 600k-row final projection, which dominated its runtime. */
  private def stackedGlobalBounds(trips: DataFrame,
                                  xs: Seq[(String, Column, Double)]): DataFrame = {
    val stacked = trips.select(
      explode(map(xs.flatMap { case (n, c, _) =>
        Seq(lit(n), c.cast("double"))
      }: _*)).as(Seq("__col", "__x")))
    val bounds = Outliers.madBoundsLog1p(stacked, Seq("__col"), "__x", 1.0)
    val aggs = xs.flatMap { case (n, _, _) => Seq(
      max(when(col("__col") === n, col("median_log"))).as(s"__med_$n"),
      max(when(col("__col") === n, col("mad_log"))).as(s"__mad_$n"),
      max(when(col("__col") === n && col("lower").isNotNull, lit(1))).as(s"__ok_$n"))
    }
    bounds.groupBy().agg(aggs.head, aggs.tail: _*)
      .select(xs.flatMap { case (n, _, k) => Seq(
        when(col(s"__ok_$n") === 1,
          exp(col(s"__med_$n") - lit(k) * col(s"__mad_$n")) - lit(1.0)).as(s"__lo_$n"),
        when(col(s"__ok_$n") === 1,
          exp(col(s"__med_$n") + lit(k) * col(s"__mad_$n")) - lit(1.0)).as(s"__hi_$n"))
      }: _*)
  }

  private def loOf(n: String): Column = col(s"__lo_$n")
  private def hiOf(n: String): Column = col(s"__hi_$n")

  /** Alerts 18/21/23 from the one stacked bounds pass. Output:
    * (submission_id, fisher_child, fisher_man, fisher_woman,
    * alert_fishers, n_gleaners, alert_gleaners, alert_fuel, fuel) with
    * each validator's nulling semantics applied. */
  def globalOutlierAlerts(trips: DataFrame, cfg: Config): DataFrame = {
    val fisherCols = Seq("fisher_child", "fisher_man", "fisher_woman")
    val base = trips.select(col("submission_id") +:
      (fisherCols.map(c => col(c).cast("double").as(c)) ++ Seq(
        abs(col("n_gleaners").cast("double")).as("n_gleaners"),
        col("fuel").cast("double").as("fuel"))): _*)
    val wide = stackedGlobalBounds(base,
      fisherCols.map(c => (c, col(c), cfg.kFishers)) ++ Seq(
        ("n_gleaners", col("n_gleaners"), cfg.kGleaners),
        // the fuel MAD is computed over fuel >= 0 (see object doc)
        ("fuel", when(col("fuel") >= 0, col("fuel")), cfg.kFuel)))
    def outsideBoth(c: String) = hiOf(c).isNotNull &&
      (col(c) < loOf(c) || col(c) > hiOf(c))
    val fisherAlert = when(fisherCols.map(outsideBoth).reduce(_ || _), lit(18))
    val gleanerFlag = hiOf("n_gleaners").isNotNull &&
      col("n_gleaners") > hiOf("n_gleaners")
    val fuelFlag = hiOf("fuel").isNotNull && col("fuel") > hiOf("fuel")
    base.crossJoin(broadcast(wide))
      .select(col("submission_id") +:
        (fisherCols.map(c => when(fisherAlert.isNull, col(c)).as(c)) ++ Seq(
          fisherAlert.as("alert_fishers"),
          when(!gleanerFlag, col("n_gleaners")).as("n_gleaners"),
          when(gleanerFlag, lit(21)).as("alert_gleaners"),
          when(col("fuel") < 0, lit(23))
            .when(fuelFlag, lit(23)).as("alert_fuel"),
          when(col("fuel") >= 0 && !fuelFlag, col("fuel")).as("fuel"))): _*)
  }

  /** Alert 1/2/3 IMEI ladder (`validate_this_imei`,
    * `R/validation-functions.R:12-48`): null/"0" → nothing to validate;
    * negative → abs (typo); < 9999 → too short (1); suffix-match count
    * against the registry: 1 → resolved, >1 → ambiguous (2), 0 → no
    * match (3). Output: (submission_id, imei_resolved, alert_imei). */
  /** The device registry exploded into its ≥ 4-char suffixes and
    * pre-aggregated per suffix: `device ends with s` ⟺ `one of device's
    * suffixes equals s`, and aggregating match count + unique device on
    * the REGISTRY side makes the whole suffix match a broadcast hash
    * join with no shuffle of the trip table at all — the theta
    * `endsWith` form is a nested-loop |trips| × |registry| scan, and a
    * trip-side groupBy would shuffle the big table. */
  private def suffixCounts(registry: DataFrame, cfg: Config): DataFrame = {
    val nReg = registry.limit((cfg.maxRegistryRows + 1).toInt).count()
    require(nReg <= cfg.maxRegistryRows,
      s"device registry has > ${cfg.maxRegistryRows} rows; the suffix " +
        "registry is broadcast-only — shard or pre-resolve it first")
    registry
      .select(col("device_imei"),
        explode(sequence(lit(4), length(col("device_imei")))).as("__len"))
      .select(col("device_imei"),
        col("device_imei")
          .substr(length(col("device_imei")) - col("__len") + 1, col("__len"))
          .as("__suffix"))
      .groupBy(col("__suffix"))
      .agg(count(col("device_imei")).as("__n"), min(col("device_imei")).as("__res"))
  }

  private def imeiNumExpr: Column =
    when(col("imei").isNull || col("imei") === "0", lit(null).cast("long"))
      .otherwise(abs(col("imei").cast("long")))

  /** Ladder over the joined suffix counts: too short → 1, ambiguous →
    * 2, no match (null `__n` from the left-join miss) → 3. */
  private def imeiAlertExpr: Column =
    when(col("__imei_num").isNull, lit(null).cast("int"))
      .when(col("__imei_num") < 9999, lit(1))
      .when(col("__n") === 1, lit(null).cast("int"))
      .when(col("__n") > 1, lit(2))
      .otherwise(lit(3))

  def imeiLadder(trips: DataFrame, registry: DataFrame,
                 cfg: Config = Config()): DataFrame =
    trips.select(col("submission_id"), imeiNumExpr.as("__imei_num"))
      // ineligible rows (null/"0"/too-short) get a null join key — null
      // keys never match, so no pre-filter + join-back is needed
      .withColumn("__suffix",
        when(col("__imei_num") >= 9999, col("__imei_num").cast("string")))
      .join(broadcast(suffixCounts(registry, cfg)), Seq("__suffix"), "left")
      .select(col("submission_id"),
        when(col("__n") === 1, col("__res")).as("imei_resolved"),
        imeiAlertExpr.as("alert_imei"))

  /** Alert 4/10 (`validate_surveys_time` dates,
    * `R/validation-functions.R:74-94`): landing date after submission →
    * 4; more than `maxDelayDays` before submission → 10. */
  def dateAlerts(trips: DataFrame, cfg: Config): DataFrame =
    trips.select(col("submission_id"), col("landing_date"),
      when(col("landing_date") > col("submission_date"), lit(4))
        .when(col("landing_date") <
          date_sub(col("submission_date"), cfg.maxDelayDays), lit(10))
        .as("alert_date"))

  /** Alert 5 (`validate_surveys_time` duration, `:95-111`): |duration|
    * over the cap or under 1 h → 5, trip_length nulled. */
  def durationAlerts(trips: DataFrame, cfg: Config): DataFrame = {
    val dur = abs(col("duration_hrs"))
    trips.select(col("submission_id"),
      when(dur > cfg.maxTripHours || dur < 1.0, lit(null).cast("double"))
        .otherwise(dur).as("trip_length"),
      when(dur > cfg.maxTripHours || dur < 1.0, lit(5)).as("alert_duration"))
  }

  /** Alert 22 (`validate_landing_regularity`, `:115-184`): per
    * submission, first species (catch order), |total value|, summed
    * |n_individuals|; flags the six inconsistency clauses verbatim. */
  def regularityAlerts(catchRows: DataFrame, trips: DataFrame): DataFrame = {
    val per = catchRows.groupBy(col("submission_id"))
      .agg(
        min_by(col("species"), col("line_no")).as("__sp"),
        sum(abs(col("n_individuals"))).as("__n"))
    per.join(
      trips.select(col("submission_id"),
        abs(col("total_catch_value")).as("__v")),
      Seq("submission_id"))
      .select(col("submission_id"),
        when(
          (col("__sp") === "0" && col("__n") > 0) ||
            (col("__sp") === "0" && col("__v") > 0) ||
            (col("__sp") =!= "0" && col("__n") <= 0) ||
            (col("__sp") =!= "0" && col("__v") <= 0) ||
            (col("__v") <= 0 && col("__n") > 0) ||
            (col("__v") > 0 && col("__n") <= 0), lit(22))
          .as("alert_regularity"))
  }

  /** Alert 6 (`validate_catch_price`, `:207-231`): on regular
    * submissions only, total value above the cap. */
  def priceCapAlerts(trips: DataFrame, regularity: DataFrame, cfg: Config): DataFrame =
    trips.join(regularity, Seq("submission_id"), "left")
      .filter(col("alert_regularity").isNull)
      .select(col("submission_id"),
        when(col("total_catch_value") > cfg.priceCap, lit(6)).as("alert_price6"))

  /** Alert 11 row flags (`validate_catch_params`, `:303-382`): per
    * (gear, species) LocScaleB on n_individuals (larger-only), over
    * regular submissions. Null gear keys are coalesced to a sentinel so
    * the bounds join back (R keeps the NA group; SQL joins drop null
    * keys). Returns catch rows + `row_alert11`. */
  def catchParamRowFlags(catchRows: DataFrame, trips: DataFrame,
                         regularity: DataFrame, cfg: Config): DataFrame = {
    val regular = regularity.filter(col("alert_regularity").isNull)
      .select("submission_id")
    // The joined catch-row frame feeds four consumers (the histogram's
    // median / nonzero / MAD reads plus the flagged output); persist +
    // materialize it once — recomputing the two sid-joins per consumer
    // dominates the whole validation fold otherwise.
    val rows = catchRows
      .join(regular, Seq("submission_id"), "left_semi")
      .join(trips.select(col("submission_id"),
        coalesce(col("gear_code"), lit(-1L)).as("__gear")),
        Seq("submission_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rows.count()
    val bounds = Outliers.madBoundsLog1p(
      rows, Seq("__gear", "species"), "n_individuals", cfg.kInd)
      .select(col("__gear"), col("species"), col("upper").as("__hi11"))
    rows.join(broadcast(bounds), Seq("__gear", "species"), "left")
      .withColumn("row_alert11",
        col("__hi11").isNotNull && col("n_individuals") > col("__hi11"))
      .drop("__gear", "__hi11")
  }

  /** Alert 17 + the price-weight precedence ladder
    * (`validate_price_weight`, `:405-506`): per regular, un-capped
    * submission, total weight over rows that survived row-level
    * validation (not 11-flagged, n≠0, weight≠0); pk = value / kg out of
    * band → 17. Final per-submission alert = 17 → 22 → 6 → 11 (the
    * full-join + coalesce of the reference collapses to this ladder). */
  def priceWeightLadder(trips: DataFrame, regularity: DataFrame,
                        price6: DataFrame, catchFlagged: DataFrame,
                        cfg: Config): DataFrame = {
    // ONE aggregation over catchFlagged for both the 11-census and the
    // eligible-weight sum: two separate groupBys would evaluate the
    // (bounds-joined) catchFlagged subtree twice — identical subtrees
    // also let ReuseExchange collapse the two downstream uses.
    val per = catchFlagged.groupBy(col("submission_id"))
      .agg(
        max(when(col("row_alert11"), lit(11))).as("alert_c11"),
        // weight_g is 2-decimal; decimal-route the sum for bit parity
        // (a null-when filter inside the sum ≡ the reference's row filter)
        graft.core.Exact.dsum(when(!col("row_alert11") &&
          col("n_individuals") =!= 0 && col("weight_g") =!= 0,
          col("weight_g"))).as("__w_g"))
    val c11 = per.select(col("submission_id"), col("alert_c11"))
    val pk = trips.select(col("submission_id"), col("total_catch_value"))
      .join(price6.filter(col("alert_price6").isNull).select("submission_id"),
        Seq("submission_id"), "left_semi")
      .join(per.filter(col("__w_g").isNotNull), Seq("submission_id"))
      .select(col("submission_id"),
        when(col("total_catch_value") / (col("__w_g") / 1000.0) < cfg.priceKgMin ||
          col("total_catch_value") / (col("__w_g") / 1000.0) > cfg.priceKgMax, lit(17))
          .as("alert_pw17"))
    trips.select(col("submission_id"), col("total_catch_value"))
      .join(pk, Seq("submission_id"), "left")
      .join(regularity, Seq("submission_id"), "left")
      .join(price6, Seq("submission_id"), "left")
      .join(c11, Seq("submission_id"), "left")
      .select(col("submission_id"),
        coalesce(col("alert_pw17"), col("alert_regularity"),
          col("alert_price6"), col("alert_c11")).as("alert_pw"),
        when(coalesce(col("alert_pw17"), col("alert_regularity"),
          col("alert_price6"), col("alert_c11")).isNull,
          col("total_catch_value")).as("catch_price"))
  }

  /** Vessel / gear joins (`:509-554`). The reference's alerts 12/13/14/15
    * are dead code (`isTRUE` on a vector — see object doc); replicated
    * as literal nulls. Carries vessel_type / gear_type. */
  def vesselTypes(trips: DataFrame, vesselDim: DataFrame): DataFrame =
    trips.select(col("submission_id"), col("boat_code"))
      .join(broadcast(vesselDim), Seq("boat_code"), "left")
      .select(col("submission_id"), col("boat_type").as("vessel_type"),
        lit(null).cast("int").as("alert_vessel"))

  def gearTypes(trips: DataFrame, gearDim: DataFrame): DataFrame =
    trips.select(col("submission_id"), col("gear_code"))
      .join(broadcast(gearDim), Seq("gear_code"), "left")
      .select(col("submission_id"), col("gear_id").as("gear_type"),
        lit(null).cast("int").as("alert_gear"))

  /** Alert 16 (`validate_sites`, `:556-576`): stations × reporting
    * units (inner), trimmed names; unknown station or missing region →
    * 16. */
  def siteAlerts(trips: DataFrame, stations: DataFrame,
                 reportingUnits: DataFrame): DataFrame = {
    val sites = stations
      .filter(col("station_code").isNotNull)
      .join(broadcast(reportingUnits), Seq("reporting_unit"))
      .select(col("station_code").cast("string").as("station_code"),
        trim(col("station_name")).as("station_name"),
        col("reporting_unit").as("reporting_region"))
      .distinct()
    trips.select(col("submission_id"),
      col("station_code").cast("string").as("station_code"))
      .join(broadcast(sites), Seq("station_code"), "left")
      .select(col("submission_id"), col("station_name"), col("reporting_region"),
        when(col("station_name").isNull || col("reporting_region").isNull, lit(16))
          .as("alert_site"))
  }

  /** Alert 18 (`validate_n_fishers`, `:579-594`): three global
    * LocScaleB columns (child/man/woman), both sides → 18, coalesced;
    * all three counts nulled when any fires. Thin view over
    * [[globalOutlierAlerts]] (one stacked pass). */
  def fisherAlerts(trips: DataFrame, cfg: Config): DataFrame =
    globalOutlierAlerts(trips, cfg).select(col("submission_id"),
      col("fisher_child"), col("fisher_man"), col("fisher_woman"),
      col("alert_fishers"))

  /** Alert 19 (`validate_habitat`, `:597-628`): non-null habitat code
    * outside the dimension → 19; decoded habitat_type nulled on alert. */
  def habitatAlerts(trips: DataFrame, habitatDim: DataFrame): DataFrame = {
    val decoded = trips.select(col("submission_id"), col("habitat_code"))
      .withColumn("__ht",
        when(col("habitat_code") === 1, "Reef")
          .when(col("habitat_code") === 2, "FAD")
          .when(col("habitat_code") === 3, "Deep")
          .when(col("habitat_code") === 4, "Beach")
          .when(col("habitat_code") === 5, "Traditional FAD")
          .when(col("habitat_code") === 6, "Mangrove")
          .when(col("habitat_code") === 7, "Seagrass"))
    decoded
      .join(broadcast(habitatDim.withColumn("__known", lit(1))),
        Seq("habitat_code"), "left")
      .select(col("submission_id"),
        when(col("habitat_code").isNotNull && col("__known").isNull, lit(19))
          .as("alert_habitat"),
        when(col("habitat_code").isNull || col("__known").isNotNull, col("__ht"))
          .as("habitat_type"))
  }

  /** Alert 20 (`validate_mesh`, `:630-655`): "seluk" → null, coalesce
    * with the free-text column, ×25.4 to mm; out of [0, limit] → 20. */
  def meshAlerts(trips: DataFrame, cfg: Config): DataFrame = {
    val mm = coalesce(
      when(col("mesh_size") === "seluk", lit(null)).otherwise(col("mesh_size")),
      col("mesh_other")).cast("double") * lit(25.4)
    trips.select(col("submission_id"), mm.as("__mm"))
      .select(col("submission_id"),
        when(col("__mm") < 0 || col("__mm") > cfg.meshLimitMm, lit(20))
          .as("alert_mesh"),
        when(col("__mm") >= 0 && col("__mm") <= cfg.meshLimitMm, col("__mm"))
          .as("mesh_size_mm"))
  }

  /** Alert 21 (`validate_gleaners`, `:658-677`): |n| global LocScaleB,
    * larger-only → 21. Thin view over [[globalOutlierAlerts]]. */
  def gleanerAlerts(trips: DataFrame, cfg: Config): DataFrame =
    globalOutlierAlerts(trips, cfg).select(col("submission_id"),
      col("n_gleaners"), col("alert_gleaners"))

  /** Alert 23 (`validate_fuel`, `:679-702`): negative → 23; global
    * LocScaleB (larger-only, over fuel ≥ 0 — see object doc) → 23; the
    * has_boat arm is dead code in the reference. Thin view over
    * [[globalOutlierAlerts]]. */
  def fuelAlerts(trips: DataFrame, cfg: Config): DataFrame =
    globalOutlierAlerts(trips, cfg).select(col("submission_id"),
      col("alert_fuel"), col("fuel"))

  /** `validate_conservation` / `validate_happiness` (`:704-729`): pure
    * carries, alert always null. */
  def conservationJoin(trips: DataFrame, conservationDim: DataFrame): DataFrame =
    trips.select(col("submission_id"), col("conservation_code"))
      .join(broadcast(conservationDim), Seq("conservation_code"), "left")
      .select(col("submission_id"), col("conservation_place"))

  def happinessCarry(trips: DataFrame): DataFrame =
    trips.select(col("submission_id"), col("happiness").cast("int").as("happiness"))

  /** Columns united into the flags-sheet alert string, in the
    * reference's frame order (`R/validate-landings.R:211-229`). */
  val uniteOrder: Seq[String] = Seq(
    "alert_imei", "alert_date", "alert_duration", "alert_pw",
    "alert_vessel", "alert_gear", "alert_site", "alert_fishers",
    "alert_habitat", "alert_mesh", "alert_gleaners")

  /** The full 15-validator fold, re-expressed for Spark's execution
    * model: every trip-local validator (imei ladder, dates, duration,
    * dims, sites, mesh, habitat, the three global-MAD outlier checks)
    * is a COLUMN EXPRESSION after a broadcast join — not a
    * sid-keyed join — so the trip table flows through ONE wide
    * whole-stage-codegen projection and is shuffled exactly once, to
    * meet the catch-side per-submission aggregates (the price-weight
    * ladder, the only genuinely catch-grain computation). Alert codes
    * are united in the reference's frame order ('' → "0"); cleaned
    * columns carried with each validator's nulling semantics.
    *
    * The standalone per-validator methods above remain the documented /
    * spec-tested unit surface; this composition inlines the same
    * expressions (same reference lines) and is gated end-to-end by
    * q72 + ValidateFullSpec. */
  def full(trips0: DataFrame, catchRows0: DataFrame,
           deviceRegistry: DataFrame, vesselDim: DataFrame,
           gearDim: DataFrame, stations: DataFrame,
           reportingUnits: DataFrame, habitatDim: DataFrame,
           conservationDim: DataFrame,
           cfg: Config = Config()): DataFrame = {
    // The raw inputs are NOT persisted: each is a pruned projection
    // over columnar source scans, and re-scanning (2× catch, 3× trips)
    // costs less than a persist + eager-count barrier per input — every
    // barrier is a sequential job on the entry point's critical path
    // (measured: dropping both input persists cut ~2 s of the fold's
    // wall time at sf0.1 while total scan work stayed trivial).
    //
    // Widen under-split inputs once up front (graft.core.Widen): the
    // CPU-dense validator stages — the stacked-bounds explode and the
    // final 15-validator projection — otherwise inherit a one-file
    // input's single task (measured: the final projection ran 3-10 s on
    // one core at sf0.1). With production inputs arriving in many
    // splits this is a no-op.
    val trips = graft.core.Widen.widen(trips0)
    val catchRows = graft.core.Widen.widen(catchRows0)

    // --- catch side, recomposed at the submission grain ---
    // The standalone regularity/price-cap/price-weight validators chain
    // five sid-keyed joins (each a shuffle + its own subtree); here the
    // whole precedence ladder is COLUMN EXPRESSIONS over one persisted
    // submission-grain frame (`tripSide`) + one per-submission aggregate
    // of the flagged catch rows — 2 sid joins total (measured: the
    // ladder alone 5.7 s → the whole catch side ~3 s at sf0.1).
    // The regularity clauses need ONLY the "0" / not-"0" / NULL state
    // of the ordered-first species, so the state rides the ordering
    // key's low TWO bits and the aggregate is a pure int64 min —
    // HashAggregate, map-combined. The standalone validator keeps the
    // readable string min_by; that form is a SortAggregate (string
    // buffers aren't mutable in Spark's hash aggregate), measured 20 s
    // of task CPU here at sf0.1. NULL species is a genuine third
    // state: in R's case_when (and the standalone min_by form) an NA
    // species satisfies neither the `== "0"` nor the `!= "0"` clause,
    // so a two-state encoding that lumped NULL with "not 0" would
    // mis-fire clauses 3/4. On duplicate line_no ties the min prefers
    // "0" < not-"0" < NULL — deterministic where min_by was arbitrary.
    val perReg = catchRows.groupBy(col("submission_id"))
      .agg(
        min(col("line_no") * 4 +
          when(col("species").isNull, lit(2L))
            .when(col("species") === "0", lit(0L))
            .otherwise(lit(1L))).as("__spk"),
        sum(abs(col("n_individuals"))).as("__n"))
    val sp0 = col("__spk") % 4 === 0  // ordered-first species is "0"
    val spN = col("__spk") % 4 === 1  // … is non-null and not "0"
    // the six inconsistency clauses of `validate_landing_regularity`
    // (R/validation-functions.R:115-184); no catch rows → all-null → regular
    val aReg = when(
      (sp0 && col("__n") > 0) ||
        (sp0 && col("__v") > 0) ||
        (spN && col("__n") <= 0) ||
        (spN && col("__v") <= 0) ||
        (col("__v") <= 0 && col("__n") > 0) ||
        (col("__v") > 0 && col("__n") <= 0), lit(22))
    // Pinned (lazy localCheckpoint): consumed by `rows` (twice after
    // plan duplication), `pw`, and the stacked histogram. Round 5 left
    // the whole fold lazy on the theory that ReuseExchange would
    // deduplicate the shared subtrees; the executed plan shows it does
    // NOT — projection pushdown diverges every consumer's copy (same
    // failure mode the dedup operators document), so the catch-side
    // SortAggregate and this join re-ran 3-4×. The pin is
    // submission-grain (one short row per submission).
    val tripSide = trips.select(col("submission_id"),
        col("total_catch_value").as("__tcv"),
        abs(col("total_catch_value")).as("__v"),
        coalesce(col("gear_code"), lit(-1L)).as("__gear"))
      .join(perReg, Seq("submission_id"), "left")
      .withColumn("__a_reg", aReg)
      .drop("__spk", "__n", "__v")
      .localCheckpoint(eager = false)
    // regular submissions' catch rows with the gear key, read by the
    // MAD-bounds histogram and the per-submission census. Pinned for
    // the same reason as tripSide: its two consumers' copies diverge
    // under pushdown and the lineitem scan + broadcast join re-ran per
    // copy. Catch-grain but narrow (5 columns).
    val rows = catchRows.join(
        tripSide.filter(col("__a_reg").isNull).select("submission_id", "__gear"),
        Seq("submission_id"))
      .localCheckpoint(eager = false)

    // ONE MAD histogram pass for BOTH the per-(gear, species) catch
    // bounds (alert 11) and the five global trip columns (alerts
    // 18/21/23): the group keys are disjoint ("g:<gear>" vs "c:<col>"
    // prefixes), so the union'd histogram computes identical per-group
    // results while the suite runs one percentile chain instead of two
    // concurrent ones — half the small sequential stages the exact
    // median/MAD machinery costs.
    val fisherCols = Seq("fisher_child", "fisher_man", "fisher_woman")
    val globalCols: Seq[(String, Column, Double)] =
      fisherCols.map(c => (c, col(c).cast("double"), cfg.kFishers)) ++ Seq(
        ("n_gleaners", abs(col("n_gleaners").cast("double")), cfg.kGleaners),
        // the fuel MAD is computed over fuel >= 0 (see object doc)
        ("fuel", when(col("fuel").cast("double") >= 0, col("fuel").cast("double")),
          cfg.kFuel))
    // numeric __g1 keys: gear codes are >= -1 on the catch side, the 5
    // global trip columns take -(2+index) — a per-row string concat +
    // string hashing on the histogram's 1M-row aggregation (its single
    // heaviest stage) bought nothing the sign of a long doesn't
    val catchStack = rows.select(
      col("__gear").as("__g1"),
      col("species").cast("string").as("__g2"),
      col("n_individuals").cast("double").as("__x"))
    val tripStack = trips.select(
        explode(map(globalCols.zipWithIndex.flatMap { case ((_, c, _), i) =>
          Seq(lit(-(2L + i)), c.cast("double"))
        }: _*)).as(Seq("__g1", "__x")))
      .select(col("__g1"), lit("").as("__g2"), col("__x"))
    // Pinned: the histogram result is tiny (one row per gear×species
    // group + 5 globals) but its chain — union, sort, two windows —
    // is the fold's most expensive subtree, and it has two consumers
    // (`bounds`, `wide`) whose copies diverge exactly like the above.
    val uni = Outliers.madBoundsLog1p(
        catchStack.unionByName(tripStack), Seq("__g1", "__g2"), "__x", 1.0)
      .localCheckpoint(eager = false)
    // catch-side (gear × species) upper bound at kInd; the k=1 guard
    // (`lower IS NOT NULL` ⟺ nonzero ∧ mad>0) is k-independent
    val bounds = uni.filter(col("__g1") >= -1L)
      .select(col("__g1").as("__gear"),
        col("__g2").as("species"),
        when(col("lower").isNotNull,
          exp(col("median_log") + lit(cfg.kInd) * col("mad_log")) - lit(1.0))
          .as("__hi11"))
    val f11 = col("__hi11").isNotNull && col("n_individuals") > col("__hi11")
    val per = rows.join(broadcast(bounds), Seq("__gear", "species"), "left")
      .groupBy(col("submission_id"))
      .agg(
        max(when(f11, lit(11))).as("__a_c11"),
        // weight_g is 2-decimal; decimal-route the sum for bit parity
        // (a null-when filter inside the sum ≡ the reference's row filter)
        graft.core.Exact.dsum(when(!f11 &&
          col("n_individuals") =!= 0 && col("weight_g") =!= 0,
          col("weight_g"))).as("__w_g"))
    // the 17 → 22 → 6 → 11 precedence ladder (`validate_price_weight`,
    // R/validation-functions.R:405-506) as expressions: 6 applies to
    // regular trips over the cap; 17 to regular, un-capped trips whose
    // eligible-weight ratio leaves the band (null tcv/weight → no alert)
    val ratio = col("__tcv") / (col("__w_g") / 1000.0)
    val aP6 = when(col("__a_reg").isNull && col("__tcv") > cfg.priceCap, lit(6))
    val aPw17 = when(col("__a_reg").isNull && !(col("__tcv") > cfg.priceCap) &&
      col("__w_g").isNotNull &&
      (ratio < cfg.priceKgMin || ratio > cfg.priceKgMax), lit(17))
    val aPwAll = coalesce(aPw17, col("__a_reg"), aP6, col("__a_c11"))
    // (sid, alert_pw, catch_price) — the one sid-keyed join below
    val pw = tripSide.join(per, Seq("submission_id"), "left")
      .select(col("submission_id"),
        aPwAll.as("alert_pw"),
        when(aPwAll.isNull, col("__tcv")).as("catch_price"))

    // broadcast sides
    val suffixAgg = suffixCounts(deviceRegistry, cfg)
    val sites = stations
      .filter(col("station_code").isNotNull)
      .join(broadcast(reportingUnits), Seq("reporting_unit"))
      .select(col("station_code").cast("string").as("__scode"),
        trim(col("station_name")).as("station_name"),
        col("reporting_unit").as("reporting_region"))
      .distinct()
    // one-row lo/hi bounds frame for the global columns, pivoted out of
    // the same unified histogram (exp back-transform applied on the one
    // row, NOT per trip row), cross-broadcast into the projection
    val wideAggs = globalCols.zipWithIndex.flatMap { case ((n, _, _), i) => Seq(
      max(when(col("__g1") === -(2L + i), col("median_log"))).as(s"__med_$n"),
      max(when(col("__g1") === -(2L + i), col("mad_log"))).as(s"__mad_$n"),
      max(when(col("__g1") === -(2L + i) && col("lower").isNotNull, lit(1))).as(s"__ok_$n"))
    }
    val wide = uni.filter(col("__g1") < -1L)
      .groupBy().agg(wideAggs.head, wideAggs.tail: _*)
      .select(globalCols.flatMap { case (n, _, k) => Seq(
        when(col(s"__ok_$n") === 1,
          exp(col(s"__med_$n") - lit(k) * col(s"__mad_$n")) - lit(1.0)).as(s"__lo_$n"),
        when(col(s"__ok_$n") === 1,
          exp(col(s"__med_$n") + lit(k) * col(s"__mad_$n")) - lit(1.0)).as(s"__hi_$n"))
      }: _*)

    // Everything above stays LAZY: the whole 15-validator fold is ONE
    // Spark query. Earlier rounds persisted tripSide/rows and drove the
    // catch-side ladder and the stacked bounds as concurrent jobs with
    // localCheckpoint barriers — measured at sf0.1, AQE schedules the
    // same independent stages of the single lazy plan concurrently on
    // its own, ReuseExchange deduplicates the shared sid exchanges the
    // cache existed for, and dropping the barrier jobs (eager count,
    // two checkpoints, block-store writes) cut the entry point's wall
    // time by ~40 % while leaking zero cached blocks.
    //
    // Remaining local-bench cost is FIXED OVERHEAD, not data work
    // (profiled with tools/ProfQ): ~5 s of one-time whole-stage-codegen
    // compilation of the giant fold (gaps with zero running jobs;
    // disabling codegen removes them) plus ~0.3 s scheduling latency ×
    // ~16 sequential post-histogram stages on tiny frames. Evidence:
    // 10× the data costs +22 % wall (8.1 s at sf0.01 → 9.9 s at sf0.1),
    // and the fattest stages run 25 s of task CPU in 0.6 s of wall. On
    // a real cluster both overheads amortize to noise; locally they set
    // a ~8 s floor that further plan surgery cannot move without
    // driver-side materialization (the anti-pattern this module avoids).
    //
    // r9 A/B (quiet box, bench min-of-3, baseline q72 5.26 s / q95
    // 6.31 s): CONCURRENT-ACTION variants were built and measured —
    // the union histogram split into independent trips-only and
    // catch-only percentile chains, plus the registry/sites preps,
    // submitted from a driver thread pool so the cascades overlap.
    //  (a) eager checkpoints per subtree: q72 5.97-6.15, q95 7.28-7.84
    //      (eager final stages + lost column pruning through the q95
    //      handoff outweigh the overlap);
    //  (b) lazy checkpoints on futures, main chain as r8: q72 5.91,
    //      q95 9.11 (the split alone costs a second percentile
    //      cascade; LogicalRDD seams defeat downstream reuse);
    //  (c) AQE off entirely: 10.2 s single-pass vs 10.2 on (same).
    // All reverted — the single lazy plan with these three lazy pins
    // remains the measured optimum; the residual wall is per-stage
    // scheduling latency on a data-dependent chain (median → |x−med| →
    // MAD is inherently two sequential percentile passes), which no
    // amount of job-level concurrency removes.

    // trip-local expressions (reference lines cited on the standalone methods)
    val dur = abs(col("duration_hrs"))
    val durBad = dur > cfg.maxTripHours || dur < 1.0
    val aDate = when(col("landing_date") > col("submission_date"), lit(4))
      .when(col("landing_date") < date_sub(col("submission_date"), cfg.maxDelayDays), lit(10))
    val mm = coalesce(
      when(col("mesh_size") === "seluk", lit(null)).otherwise(col("mesh_size")),
      col("mesh_other")).cast("double") * lit(25.4)
    val ht = when(col("habitat_code") === 1, "Reef")
      .when(col("habitat_code") === 2, "FAD")
      .when(col("habitat_code") === 3, "Deep")
      .when(col("habitat_code") === 4, "Beach")
      .when(col("habitat_code") === 5, "Traditional FAD")
      .when(col("habitat_code") === 6, "Mangrove")
      .when(col("habitat_code") === 7, "Seagrass")
    def fisherC(c: String) = col(c).cast("double")
    def outsideBoth(c: String) = hiOf(c).isNotNull &&
      (fisherC(c) < loOf(c) || fisherC(c) > hiOf(c))
    val aFishers = when(fisherCols.map(outsideBoth).reduce(_ || _), lit(18))
    val gle = abs(col("n_gleaners").cast("double"))
    val gleanerFlag = hiOf("n_gleaners").isNotNull && gle > hiOf("n_gleaners")
    val fuelD = col("fuel").cast("double")
    val fuelFlag = hiOf("fuel").isNotNull && fuelD > hiOf("fuel")

    val alerts = Map[String, Column](
      "alert_imei" -> imeiAlertExpr,
      "alert_date" -> aDate,
      "alert_duration" -> when(durBad, lit(5)),
      "alert_pw" -> col("alert_pw"),
      "alert_vessel" -> lit(null).cast("int"), // dead code in the reference (isTRUE on a vector)
      "alert_gear" -> lit(null).cast("int"),
      "alert_site" -> when(col("station_name").isNull || col("reporting_region").isNull, lit(16)),
      "alert_fishers" -> aFishers,
      "alert_habitat" -> when(col("habitat_code").isNotNull && col("__known").isNull, lit(19)),
      "alert_mesh" -> when(mm < 0 || mm > cfg.meshLimitMm, lit(20)),
      "alert_gleaners" -> when(gleanerFlag, lit(21)))
    val united = Dates.uniteCodes(uniteOrder.map(alerts))

    trips
      .withColumn("__imei_num", imeiNumExpr)
      .withColumn("__suffix",
        when(col("__imei_num") >= 9999, col("__imei_num").cast("string")))
      .withColumn("__scode", col("station_code").cast("string"))
      .join(broadcast(suffixAgg), Seq("__suffix"), "left")
      .join(broadcast(vesselDim), Seq("boat_code"), "left")
      .join(broadcast(gearDim), Seq("gear_code"), "left")
      .join(broadcast(sites), Seq("__scode"), "left")
      .join(broadcast(habitatDim.withColumn("__known", lit(1))),
        Seq("habitat_code"), "left")
      .join(broadcast(conservationDim), Seq("conservation_code"), "left")
      .crossJoin(broadcast(wide))
      .join(pw, Seq("submission_id"), "left")
      .select(
        col("submission_id"),
        when(col("__n") === 1, col("__res")).as("imei_resolved"),
        col("landing_date"),
        when(durBad, lit(null).cast("double")).otherwise(dur).as("trip_length"),
        col("catch_price"),
        col("boat_type").as("vessel_type"),
        col("gear_id").as("gear_type"),
        col("station_name"), col("reporting_region"),
        when(aFishers.isNull, fisherC("fisher_child")).as("fisher_child"),
        when(aFishers.isNull, fisherC("fisher_man")).as("fisher_man"),
        when(aFishers.isNull, fisherC("fisher_woman")).as("fisher_woman"),
        when(alerts("alert_habitat").isNull, ht).as("habitat_type"),
        when(mm >= 0 && mm <= cfg.meshLimitMm, mm).as("mesh_size_mm"),
        when(!gleanerFlag, gle).as("n_gleaners"),
        when(fuelD < 0, lit(23)).when(fuelFlag, lit(23)).as("alert_fuel"),
        when(fuelD >= 0 && !fuelFlag, fuelD).as("fuel"),
        col("conservation_place"),
        col("happiness").cast("int").as("happiness"),
        when(united === "", lit("0")).otherwise(united).as("alert"))
  }
}
