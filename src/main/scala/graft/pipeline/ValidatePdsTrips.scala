package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Geo

/** The validate-pds-trips entry point (SURVEY §3's PDS half,
  * `/root/reference/R/validate-pds-trips.R:17-205` +
  * `R/preprocess-pds-trips.R:101-145`): trip dedupe/eligibility, the
  * per-track diagnostics (start-end distance, speed-outlier proportion,
  * time-trace dispersion), and the three PDS validators.
  *
  * Faithfulness notes (verified against the reference source):
  *  - `get_tracks_descriptors` downloads and folds ONE track file at a
  *    time into an rbind loop; here all tracks are one grouped
  *    aggregation over the points table — same outputs, one pass.
  *  - `timetrace_dispersion = sd(diff(track$Time))` is computed closed-
  *    form over the integer-second gaps (Σd, Σd² as int64): R's `sd` is
  *    the sample sd, and the closed form over exact integer sums is
  *    bit-reproducible at any parallelism, unlike `stddev_samp`'s
  *    streaming merge (order-dependent in the last ULPs).
  *  - Start-end distance is haversine, not `geosphere::distGeo`
  *    (≈0.3 % divergence, documented in SURVEY §2.8).
  *  - Alert 12 (one-way trips, `start_end_distance > se_km * 100`) is
  *    DEAD CODE in the reference: its `case_when` lists `TRUE ~ NA` as
  *    the second arm, so no later arm can ever fire
  *    (`R/validate-pds-trips.R:178-181`). Replicated as a literal null.
  *  - `as_datetime(tz = "Asia/Dili")` attaches a display timezone to an
  *    unchanged instant; timestamps here stay TimestampType (session tz
  *    UTC) — rendering is a sink concern.
  */
object ValidatePdsTrips {

  final case class Config(
      maxHrs: Double = 72.0,
      minHrs: Double = 0.5,
      km: Double = 100.0,
      seKm: Double = 0.5,
      outl: Double = 10.0,
      timet: Double = 300.0)

  /** Trip-table preparation (`R/validate-pds-trips.R:36-54`): drop
    * duplicated trips keeping the LARGEST trip id (the reference sorts
    * `desc(Trip)` then keeps the first of each duplicate group), keep
    * trips whose tracker reported after the trip ended and started, and
    * compute the gap to the boat's next trip in minutes (lead over the
    * per-boat start order — feeds `merge_consecutive_trips`, whose
    * chain-collapse kernel is `operators/Chain`).
    *
    * `trips`: (trip, boat, started, ended, last_seen, …). */
  def prepare(trips: DataFrame): DataFrame = {
    val dupKey = trips.columns.filter(_ != "trip").map(col).toSeq
    val dedup = Window.partitionBy(dupKey: _*).orderBy(col("trip").desc)
    val nextStart = Window.partitionBy(col("boat")).orderBy(col("started"), col("trip"))
    trips
      .withColumn("__rn", row_number().over(dedup))
      .filter(col("__rn") === 1).drop("__rn")
      .filter(col("last_seen") > col("ended") && col("last_seen") > col("started"))
      .withColumn("end_start_time",
        (unix_timestamp(lead(col("started"), 1).over(nextStart)) -
          unix_timestamp(col("ended"))).cast("double") / 60.0)
  }

  /** `get_tracks_descriptors` (`R/preprocess-pds-trips.R:101-145`) for
    * ALL trips in one grouped pass. `points`: (trip, tsec [epoch
    * seconds], lat, lng, speed_ms, ordCol) where `ordCol` is a total
    * order within the trip (the reference relies on file row order).
    * Output per trip: start/end coordinates, `start_end_distance`
    * (meters), `outliers_proportion` (% of points over 30 m/s),
    * `timetrace_dispersion` (sample sd of consecutive gaps; null for
    * single-point tracks, as R's `sd` of an empty diff). */
  def trackDescriptors(points: DataFrame, ordCol: String): DataFrame = {
    val w = Window.partitionBy(col("trip")).orderBy(col(ordCol))
    points
      .withColumn("__d", col("tsec") - lag(col("tsec"), 1).over(w))
      .groupBy(col("trip"))
      .agg(
        min_by(col("lat"), col(ordCol)).as("start_lat"),
        min_by(col("lng"), col(ordCol)).as("start_lng"),
        max_by(col("lat"), col(ordCol)).as("end_lat"),
        max_by(col("lng"), col(ordCol)).as("end_lng"),
        (sum(when(col("speed_ms") > 30.0, lit(1L)).otherwise(lit(0L))) * lit(100.0) /
          count(lit(1))).as("outliers_proportion"),
        sum(col("__d")).as("__s1"),
        // int64 bound: Σd² overflows only past ~10⁴ points with year-long
        // gaps inside ONE trip — far outside any tracker's physical range
        sum(col("__d") * col("__d")).as("__s2"),
        count(col("__d")).as("__n"))
      .withColumn("timetrace_dispersion",
        when(col("__n") > 1,
          sqrt((col("__s2").cast("double") -
            col("__s1").cast("double") * col("__s1").cast("double") / col("__n")) /
            (col("__n") - 1).cast("double"))))
      .withColumn("start_end_distance",
        Geo.haversineKm(col("start_lat"), col("start_lng"),
          col("end_lat"), col("end_lng")) * lit(1000.0))
      .drop("__s1", "__s2", "__n")
  }

  /** `validate_pds_data` (`R/validate-pds-trips.R:149-205`) +
    * the entry point's reduce-join (`:77-94`), collapsed to the wide
    * validated frame the reference actually ships: alert 8 nulls
    * duration/start/end, alert 9 nulls distance, alert 12 is dead code
    * (see object doc), alert 13's cleaning joins in as keys only and
    * therefore has no effect on the shipped columns — the alerts remain
    * as diagnostic columns.
    *
    * `trips`: (trip, duration_s, distance_m, started, ended,
    * outliers_proportion, timetrace_dispersion, …). `carry` names
    * input columns appended unchanged — one projection instead of a
    * join-back when the caller also wants diagnostics. */
  def validated(trips: DataFrame, cfg: Config = Config(),
                carry: Seq[String] = Nil): DataFrame = {
    val a8 = when(col("duration_s") > cfg.maxHrs * 3600.0 ||
      col("duration_s") < cfg.minHrs * 3600.0, lit(8))
    val a9 = when(col("distance_m") > cfg.km * 1000.0, lit(9))
    val a13 = when(col("outliers_proportion") > cfg.outl ||
      col("timetrace_dispersion") > cfg.timet, lit(13))
    trips.select(Seq(
      col("trip").as("tracker_trip_id"),
      a8.as("alert_duration"),
      a9.as("alert_distance"),
      lit(null).cast("int").as("alert_one_way"), // dead code in the reference
      a13.as("alert_quality"),
      when(a8.isNull, col("duration_s")).as("tracker_trip_duration"),
      when(a8.isNull, col("started")).as("tracker_trip_start"),
      when(a8.isNull, col("ended")).as("tracker_trip_end"),
      when(a9.isNull, col("distance_m")).as("tracker_trip_distance")) ++
      carry.map(col): _*)
  }
}
