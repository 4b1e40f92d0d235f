package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.pipeline.{FlagsSync, ValidateLandings}

/** The validate-landings product surface under the oracle (SURVEY §3.1):
  * q72 runs the FULL 15-validator fold and gates the per-alert-string
  * census plus the cleaned-value nulling; q73 gates the flags-sheet
  * human-in-the-loop sync.
  *
  * The landings fixture is derived deterministically from the TPC-H
  * tables (orders → trips, lineitem → exploded catch rows, supplier →
  * device registry, nation×region → stations) with pure integer
  * arithmetic so both engines see bit-identical inputs.
  */
object ValidateQueries {

  /** Deterministic trip-grain landings fixture from `orders`. */
  def fixtureTrips(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    orders(s, d).select(
      k.as("submission_id"),
      to_date(col("o_orderdate")).as("landing_date"),
      date_add(to_date(col("o_orderdate")), (k % 40 - 2).cast("int")).as("submission_date"),
      when(k % 11 === 0, lit("0"))
        .when(k % 13 === 0, (-(lit(5000) + k % 4000)).cast("string"))
        .otherwise((lit(10000) + k % 200).cast("string")).as("imei"),
      (k % 120).cast("double").as("duration_hrs"),
      (k % 2000).cast("double").as("total_catch_value"),
      when(k % 17 === 0, lit(null).cast("long")).otherwise(k % 12).as("boat_code"),
      (k % 5 =!= 0).as("has_boat"),
      when(k % 19 === 0, lit(null).cast("long")).otherwise(k % 12).as("gear_code"),
      (k % 30).cast("string").as("station_code"),
      (k % 7).cast("double").as("fisher_child"),
      (k % 5 + when(k % 97 === 0, lit(80L)).otherwise(lit(0L))).cast("double").as("fisher_man"),
      (k % 3).cast("double").as("fisher_woman"),
      (k % 9).as("habitat_code"),
      when(k % 29 === 0, lit("seluk"))
        .when(k % 23 === 0, lit(null).cast("string"))
        .otherwise((k % 25).cast("string")).as("mesh_size"),
      lit("30").as("mesh_other"),
      (k % 6 + when(k % 89 === 0, lit(300L)).otherwise(lit(0L))).cast("double").as("n_gleaners"),
      when(k % 83 === 0, lit(900.0)).otherwise((k % 30 - 1).cast("double")).as("fuel"),
      (k % 4).cast("string").as("conservation_code"),
      (k % 5 + 1).cast("int").as("happiness"))
  }

  /** Exploded catch rows (species × length grain) from `lineitem`. */
  def fixtureCatch(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      col("l_orderkey").as("submission_id"),
      // l_linenumber is NOT unique per order in the synthetic data;
      // compose with partkey so the "first species" pick is an
      // engine-independent total order (remaining ties share a partkey
      // and therefore the same species value).
      (col("l_linenumber") * 10000L + col("l_partkey")).as("line_no"),
      when(col("l_partkey") % 17 === 0, lit("0"))
        .otherwise((col("l_partkey") % 40).cast("string")).as("species"),
      when(col("l_partkey") % 17 === 0,
        when(col("l_orderkey") % 3 === 0, col("l_quantity")).otherwise(lit(0.0)))
        .when(col("l_partkey") % 53 === 0, col("l_quantity") * 40)
        .otherwise(col("l_quantity")).as("n_individuals"),
      col("l_extendedprice").as("weight_g"))

  /** Device registry: 100 unique-suffix imeis + 30 duplicated suffixes
    * (exercising resolved / ambiguous / no-match ladder arms). */
  def fixtureRegistry(s: SparkSession, d: String): DataFrame = {
    val sup = supplier(s, d)
    sup.select((lit(7710001) + col("s_suppkey")).cast("string").as("device_imei"))
      .unionByName(sup.filter(col("s_suppkey") < 30)
        .select((lit(8810001) + col("s_suppkey")).cast("string").as("device_imei")))
  }

  def fixtureVesselDim(s: SparkSession): DataFrame =
    s.range(10).select(col("id").as("boat_code"),
      concat(lit("type_"), col("id")).as("boat_type"))

  def fixtureGearDim(s: SparkSession): DataFrame =
    s.range(10).select(col("id").as("gear_code"),
      concat(lit("gear_"), col("id")).as("gear_id"))

  def fixtureStations(s: SparkSession, d: String): DataFrame =
    nation(s, d).select(col("n_nationkey").cast("string").as("station_code"),
      col("n_name").as("station_name"), col("n_regionkey").as("reporting_unit"))

  def fixtureReportingUnits(s: SparkSession, d: String): DataFrame =
    region(s, d).select(col("r_regionkey").as("reporting_unit"))

  def fixtureHabitatDim(s: SparkSession): DataFrame =
    s.range(1, 8).select(col("id").as("habitat_code"))

  def fixtureConservationDim(s: SparkSession): DataFrame =
    s.range(4).select(col("id").cast("string").as("conservation_code"),
      concat(lit("place_"), col("id")).as("conservation_place"))

  /** One global-MAD bounds CTE block (log1p LocScaleB, k=2.5) named
    * `<p>_b(lo, hi)` over `trip.<x>` restricted by `where`. */
  private def globalMadSql(p: String, x: String, where: String): String =
    s"""${p}_m AS (SELECT quantile_cont(ln(1 + $x), 0.5) AS m FROM trip $where),
       |${p}_s AS (
       |  SELECT m.m, quantile_cont(abs(ln(1 + t.$x) - m.m), 0.5) * 1.4826 AS s,
       |    COUNT(CASE WHEN t.$x <> 0 THEN 1 END) AS nz
       |  FROM trip t, ${p}_m m $where GROUP BY m.m),
       |${p}_b AS (
       |  SELECT CASE WHEN s > 0 AND nz > 0 THEN exp(m - 2.5 * s) - 1.0 END AS lo,
       |         CASE WHEN s > 0 AND nz > 0 THEN exp(m + 2.5 * s) - 1.0 END AS hi
       |  FROM ${p}_s)""".stripMargin

  /** The trip fixture + imei-resolution CTE block shared by the q72
    * oracle and the q95 end-to-end composition oracle. Defines
    * `trip`, `registry`, `imatch`, `imei_a`. */
  private[queries] val oracleTripCtes: String = """trip AS (
      |  SELECT o_orderkey AS sid,
      |    CAST(o_orderdate AS DATE) AS landing_date,
      |    CAST(o_orderdate AS DATE) + CAST((o_orderkey % 40) - 2 AS INTEGER) AS submission_date,
      |    CASE WHEN o_orderkey % 11 = 0 THEN NULL
      |         WHEN o_orderkey % 13 = 0 THEN 5000 + (o_orderkey % 4000)
      |         ELSE 10000 + (o_orderkey % 200) END AS imei_num,
      |    CAST(o_orderkey % 120 AS DOUBLE) AS dur,
      |    CAST(o_orderkey % 2000 AS DOUBLE) AS tcv,
      |    CASE WHEN o_orderkey % 17 = 0 THEN NULL ELSE o_orderkey % 12 END AS boat_code,
      |    CASE WHEN o_orderkey % 19 = 0 THEN NULL ELSE o_orderkey % 12 END AS gear_code,
      |    CAST(o_orderkey % 30 AS VARCHAR) AS station_code,
      |    CAST(o_orderkey % 7 AS DOUBLE) AS fc,
      |    CAST(o_orderkey % 5 + CASE WHEN o_orderkey % 97 = 0 THEN 80 ELSE 0 END AS DOUBLE) AS fm,
      |    CAST(o_orderkey % 3 AS DOUBLE) AS fw,
      |    o_orderkey % 9 AS habitat_code,
      |    CASE WHEN o_orderkey % 29 = 0 THEN 'seluk'
      |         WHEN o_orderkey % 23 = 0 THEN NULL
      |         ELSE CAST(o_orderkey % 25 AS VARCHAR) END AS mesh_main,
      |    '30' AS mesh_other,
      |    CAST(o_orderkey % 6 + CASE WHEN o_orderkey % 89 = 0 THEN 300 ELSE 0 END AS DOUBLE) AS gle,
      |    CASE WHEN o_orderkey % 83 = 0 THEN 900.0
      |         ELSE CAST((o_orderkey % 30) - 1 AS DOUBLE) END AS fuel
      |  FROM orders),
      |registry AS (
      |  SELECT CAST(7710001 + s_suppkey AS VARCHAR) AS imei FROM supplier
      |  UNION ALL
      |  SELECT CAST(8810001 + s_suppkey AS VARCHAR) FROM supplier WHERE s_suppkey < 30),
      |imatch AS (
      |  SELECT t.sid, COUNT(r.imei) AS nm, MIN(r.imei) AS res
      |  FROM trip t LEFT JOIN registry r
      |    ON ends_with(r.imei, CAST(t.imei_num AS VARCHAR))
      |  WHERE t.imei_num IS NOT NULL AND t.imei_num >= 9999
      |  GROUP BY t.sid),
      |imei_a AS (
      |  SELECT t.sid, CASE WHEN m.nm = 1 THEN m.res END AS imei_resolved,
      |    CASE WHEN t.imei_num IS NULL THEN NULL
      |         WHEN t.imei_num < 9999 THEN 1
      |         WHEN m.nm = 1 THEN NULL
      |         WHEN m.nm > 1 THEN 2
      |         ELSE 3 END AS a_imei
      |  FROM trip t LEFT JOIN imatch m ON t.sid = m.sid)""".stripMargin

  /** The catch fixture + regularity/price-cap/catch-params/price-weight
    * precedence-ladder CTE block shared with the q95 oracle. Defines
    * `catch` … `pw_a` (sid, a_pw, catch_price); depends on `trip`. */
  private[queries] val oracleCatchLadderCtes: String = """catch AS (
      |  SELECT l_orderkey AS sid, l_linenumber * 10000 + l_partkey AS ln,
      |    CASE WHEN l_partkey % 17 = 0 THEN '0'
      |         ELSE CAST(l_partkey % 40 AS VARCHAR) END AS species,
      |    CASE WHEN l_partkey % 17 = 0 THEN
      |           (CASE WHEN l_orderkey % 3 = 0 THEN l_quantity ELSE 0.0 END)
      |         WHEN l_partkey % 53 = 0 THEN l_quantity * 40
      |         ELSE l_quantity END AS n_ind,
      |    l_extendedprice AS weight_g
      |  FROM lineitem),
      |reg AS (
      |  SELECT sid, arg_min(species, ln) AS sp, SUM(abs(n_ind)) AS sn
      |  FROM catch GROUP BY sid),
      |reg_a AS (
      |  -- LEFT join: a submission with no catch rows has NULL sp/sn, every
      |  -- clause is NULL/false, a_reg is NULL -> it stays "regular" (the
      |  -- reference's per-trip frame semantics: downstream validators see
      |  -- alert_number NA and still apply, e.g. the price cap).
      |  SELECT t.sid,
      |    CASE WHEN (r.sp = '0' AND r.sn > 0) OR (r.sp = '0' AND abs(t.tcv) > 0)
      |           OR (r.sp <> '0' AND r.sn <= 0) OR (r.sp <> '0' AND abs(t.tcv) <= 0)
      |           OR (abs(t.tcv) <= 0 AND r.sn > 0) OR (abs(t.tcv) > 0 AND r.sn <= 0)
      |      THEN 22 END AS a_reg
      |  FROM trip t LEFT JOIN reg r ON r.sid = t.sid),
      |p6_a AS (
      |  SELECT t.sid, CASE WHEN t.tcv > 1500 THEN 6 END AS a_p6
      |  FROM trip t JOIN reg_a ra ON t.sid = ra.sid WHERE ra.a_reg IS NULL),
      |crows AS (
      |  SELECT c.*, COALESCE(t.gear_code, -1) AS gear_g
      |  FROM catch c
      |  JOIN reg_a ra ON c.sid = ra.sid
      |  JOIN trip t ON c.sid = t.sid
      |  WHERE ra.a_reg IS NULL),
      |cp_med AS (SELECT gear_g, species, quantile_cont(ln(1 + n_ind), 0.5) AS m
      |  FROM crows GROUP BY gear_g, species),
      |cp_mad AS (SELECT c.gear_g, c.species, m.m,
      |    quantile_cont(abs(ln(1 + c.n_ind) - m.m), 0.5) * 1.4826 AS s,
      |    COUNT(CASE WHEN c.n_ind <> 0 THEN 1 END) AS nz
      |  FROM crows c JOIN cp_med m ON c.gear_g = m.gear_g AND c.species = m.species
      |  GROUP BY c.gear_g, c.species, m.m),
      |cp_b AS (SELECT gear_g, species,
      |    CASE WHEN s > 0 AND nz > 0 THEN exp(m + 2.5 * s) - 1.0 END AS hi
      |  FROM cp_mad),
      |cflag AS (
      |  SELECT c.*, (b.hi IS NOT NULL AND c.n_ind > b.hi) AS f11
      |  FROM crows c LEFT JOIN cp_b b
      |    ON c.gear_g = b.gear_g AND c.species = b.species),
      |c11_a AS (SELECT sid, MAX(CASE WHEN f11 THEN 11 END) AS a_c11
      |  FROM cflag GROUP BY sid),
      |pw_w AS (
      |  SELECT sid, CAST(SUM(CAST(weight_g AS DECIMAL(38,6))) AS DOUBLE) AS wg
      |  FROM cflag WHERE NOT f11 AND n_ind <> 0 AND weight_g <> 0
      |  GROUP BY sid),
      |pw17 AS (
      |  SELECT t.sid,
      |    CASE WHEN t.tcv / (w.wg / 1000.0) < 0.25
      |           OR t.tcv / (w.wg / 1000.0) > 30.0 THEN 17 END AS a_pw17
      |  FROM trip t
      |  JOIN p6_a p ON t.sid = p.sid AND p.a_p6 IS NULL
      |  JOIN pw_w w ON t.sid = w.sid),
      |pw_a AS (
      |  SELECT t.sid,
      |    COALESCE(pw17.a_pw17, ra.a_reg, p6.a_p6, c11.a_c11) AS a_pw,
      |    CASE WHEN COALESCE(pw17.a_pw17, ra.a_reg, p6.a_p6, c11.a_c11) IS NULL
      |      THEN t.tcv END AS catch_price
      |  FROM trip t
      |  LEFT JOIN pw17 ON t.sid = pw17.sid
      |  LEFT JOIN reg_a ra ON t.sid = ra.sid
      |  LEFT JOIN p6_a p6 ON t.sid = p6.sid
      |  LEFT JOIN c11_a c11 ON t.sid = c11.sid)""".stripMargin

  /** q72: the full 15-validator fold — counts per united alert string
    * plus cleaned-value census (nulling semantics under the hash gate). */
  /** The validated-landings stage artifact q72 and q95 share — the
    * reference DAG passes exactly this handoff between stages through
    * its artifact store (`data-pipeline.yaml` stage outputs), so q72
    * LANDS it ([[graft.core.Landed]]) and q95 probes it instead of
    * re-running the 15-validator fold. Projected to the union of the
    * columns either consumer reads, so the fold's other dimension
    * carries still prune out of the landed plan. */
  private[queries] def validatedLanding(s: org.apache.spark.sql.SparkSession,
                                        d: String, probe: Boolean) = {
    def build = ValidateLandings.full(
        fixtureTrips(s, d), fixtureCatch(s, d),
        fixtureRegistry(s, d), fixtureVesselDim(s), fixtureGearDim(s),
        fixtureStations(s, d), fixtureReportingUnits(s, d),
        fixtureHabitatDim(s), fixtureConservationDim(s))
      .select(col("submission_id"), col("landing_date"), col("alert"),
        col("trip_length"), col("vessel_type"), col("mesh_size_mm"),
        col("fuel"), col("catch_price"), col("imei_resolved"))
    if (probe)
      graft.core.Landed.probeOrBuild(s, s"validated-landings:$d")(build)
    else graft.core.Landed.land(s, s"validated-landings:$d")(build)
  }

  val q72 = GQuery(
    "q72_validate_landings",
    (s, d) => {
      val out = validatedLanding(s, d, probe = false)
      out.groupBy(col("alert"))
        .agg(
          lcount(lit(1)).as("n_submissions"),
          lsum6(col("trip_length")).as("sum_trip_length"),
          lcount(col("vessel_type")).as("n_vessel"),
          lcount(col("mesh_size_mm")).as("n_mesh"),
          lcount(col("fuel")).as("n_fuel"),
          lcount(col("catch_price")).as("n_price"),
          lcount(col("imei_resolved")).as("n_imei"))
    },
    Some(s"""WITH $oracleTripCtes,
      |date_a AS (SELECT sid,
      |  CASE WHEN landing_date > submission_date THEN 4
      |       WHEN landing_date < submission_date - 28 THEN 10 END AS a_date FROM trip),
      |dur_a AS (SELECT sid,
      |  CASE WHEN abs(dur) > 96 OR abs(dur) < 1 THEN NULL ELSE abs(dur) END AS trip_length,
      |  CASE WHEN abs(dur) > 96 OR abs(dur) < 1 THEN 5 END AS a_dur FROM trip),
      |$oracleCatchLadderCtes,
      |vdim AS (SELECT range AS boat_code, 'type_' || range AS boat_type FROM range(10)),
      |ves AS (SELECT t.sid, v.boat_type AS vessel_type
      |  FROM trip t LEFT JOIN vdim v ON t.boat_code = v.boat_code),
      |sites AS (
      |  SELECT DISTINCT CAST(n.n_nationkey AS VARCHAR) AS station_code,
      |    trim(n.n_name) AS station_name, n.n_regionkey AS reporting_region
      |  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey),
      |site_a AS (
      |  SELECT t.sid,
      |    CASE WHEN s.station_name IS NULL OR s.reporting_region IS NULL
      |      THEN 16 END AS a_site
      |  FROM trip t LEFT JOIN sites s ON t.station_code = s.station_code),
      |${globalMadSql("fcx", "fc", "")},
      |${globalMadSql("fmx", "fm", "")},
      |${globalMadSql("fwx", "fw", "")},
      |fish_a AS (
      |  SELECT t.sid,
      |    CASE WHEN (b1.hi IS NOT NULL AND (t.fc > b1.hi OR t.fc < b1.lo))
      |           OR (b2.hi IS NOT NULL AND (t.fm > b2.hi OR t.fm < b2.lo))
      |           OR (b3.hi IS NOT NULL AND (t.fw > b3.hi OR t.fw < b3.lo))
      |      THEN 18 END AS a_fish
      |  FROM trip t, fcx_b b1, fmx_b b2, fwx_b b3),
      |hab_a AS (
      |  SELECT sid,
      |    CASE WHEN habitat_code IS NOT NULL
      |           AND habitat_code NOT IN (SELECT range FROM range(1, 8))
      |      THEN 19 END AS a_hab
      |  FROM trip),
      |mesh_a AS (
      |  SELECT sid,
      |    CASE WHEN mm < 0 OR mm > 500 THEN 20 END AS a_mesh,
      |    CASE WHEN mm >= 0 AND mm <= 500 THEN mm END AS mesh_mm
      |  FROM (SELECT sid,
      |    CAST(COALESCE(CASE WHEN mesh_main = 'seluk' THEN NULL ELSE mesh_main END,
      |      mesh_other) AS DOUBLE) * 25.4 AS mm FROM trip)),
      |${globalMadSql("glx", "gle", "")},
      |gl_a AS (
      |  SELECT t.sid,
      |    CASE WHEN b.hi IS NOT NULL AND t.gle > b.hi THEN 21 END AS a_gle,
      |    CASE WHEN NOT (b.hi IS NOT NULL AND t.gle > b.hi) THEN t.gle END AS n_gleaners
      |  FROM trip t, glx_b b),
      |${globalMadSql("fux", "fuel", "WHERE fuel >= 0")},
      |fu_a AS (
      |  SELECT t.sid,
      |    CASE WHEN t.fuel < 0 THEN 23
      |         WHEN b.hi IS NOT NULL AND t.fuel > b.hi THEN 23 END AS a_fuel,
      |    CASE WHEN t.fuel >= 0 AND NOT (b.hi IS NOT NULL AND t.fuel > b.hi)
      |      THEN t.fuel END AS fuel
      |  FROM trip t, fux_b b),
      |united AS (
      |  SELECT t.sid,
      |    concat_ws('-', i.a_imei, d.a_date, du.a_dur, pa.a_pw,
      |      sa.a_site, fa.a_fish, ha.a_hab, ma.a_mesh, ga.a_gle) AS alert0,
      |    du.trip_length, v.vessel_type, ma.mesh_mm, fu.fuel,
      |    pa.catch_price, i.imei_resolved
      |  FROM trip t
      |  LEFT JOIN imei_a i ON t.sid = i.sid
      |  LEFT JOIN date_a d ON t.sid = d.sid
      |  LEFT JOIN dur_a du ON t.sid = du.sid
      |  LEFT JOIN pw_a pa ON t.sid = pa.sid
      |  LEFT JOIN ves v ON t.sid = v.sid
      |  LEFT JOIN site_a sa ON t.sid = sa.sid
      |  LEFT JOIN fish_a fa ON t.sid = fa.sid
      |  LEFT JOIN hab_a ha ON t.sid = ha.sid
      |  LEFT JOIN mesh_a ma ON t.sid = ma.sid
      |  LEFT JOIN gl_a ga ON t.sid = ga.sid
      |  LEFT JOIN fu_a fu ON t.sid = fu.sid)
      |SELECT CASE WHEN alert0 = '' THEN '0' ELSE alert0 END AS alert,
      |  COUNT(*) AS n_submissions,
      |  ${sqlLsum6("trip_length")} AS sum_trip_length,
      |  COUNT(vessel_type) AS n_vessel,
      |  COUNT(mesh_mm) AS n_mesh,
      |  COUNT(fuel) AS n_fuel,
      |  COUNT(catch_price) AS n_price,
      |  COUNT(imei_resolved) AS n_imei
      |FROM united GROUP BY 1""".stripMargin),
    headline = true)

  /** Current-generation alerts frame for the sheet sync (machine side). */
  private def syncCurrent(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    orders(s, d).select(
      k.as("submission_id"),
      to_date(col("o_orderdate")).as("submission_date"),
      to_date(lit("2026-02-01")).as("flag_date"),
      (k % 25).cast("string").as("alert"),
      lit(false).as("validated"),
      lit(null).cast("date").as("validated_when_ymd"),
      lit(null).cast("string").as("comments"))
  }

  /** Previous-generation sheet: half the submissions, some with stale
    * alerts (k%13) and human edits (validated k%3, comments k%7). */
  private def syncSheet(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    orders(s, d).filter(k % 2 === 0).select(
      k.as("submission_id"),
      to_date(col("o_orderdate")).as("submission_date"),
      to_date(lit("2026-01-01")).as("flag_date"),
      when(k % 13 === 0, lit("99")).otherwise((k % 25).cast("string")).as("alert"),
      (k % 3 === 0).as("validated"),
      when(k % 3 === 0, to_date(lit("2026-01-10"))).as("validated_when_ymd"),
      when(k % 7 === 0, lit("checked")).as("comments"))
  }

  /** q73: flags-sheet sync — new flags appended, human edits preserved,
    * flag_date kept only when the alert is unchanged. */
  val q73 = GQuery(
    "q73_flags_sync",
    (s, d) =>
      FlagsSync.sync(syncCurrent(s, d), syncSheet(s, d))
        .groupBy(col("validated"), col("comments"), col("flag_date"))
        .agg(
          lcount(lit(1)).as("n_rows"),
          lcount(col("validated_when_ymd")).as("n_validated_dates"),
          countDistinct(col("alert")).as("n_alert_values")),
    Some("""WITH cur AS (
      |  SELECT o_orderkey AS sid, CAST(o_orderdate AS DATE) AS submission_date,
      |    DATE '2026-02-01' AS flag_date,
      |    CAST(o_orderkey % 25 AS VARCHAR) AS alert,
      |    FALSE AS validated, CAST(NULL AS DATE) AS validated_when_ymd,
      |    CAST(NULL AS VARCHAR) AS comments
      |  FROM orders),
      |sheet AS (
      |  SELECT o_orderkey AS sid, CAST(o_orderdate AS DATE) AS submission_date,
      |    DATE '2026-01-01' AS flag_date,
      |    CASE WHEN o_orderkey % 13 = 0 THEN '99'
      |         ELSE CAST(o_orderkey % 25 AS VARCHAR) END AS alert,
      |    o_orderkey % 3 = 0 AS validated,
      |    CASE WHEN o_orderkey % 3 = 0 THEN DATE '2026-01-10' END AS validated_when_ymd,
      |    CASE WHEN o_orderkey % 7 = 0 THEN 'checked' END AS comments
      |  FROM orders WHERE o_orderkey % 2 = 0),
      |merged AS (
      |  SELECT c.sid, c.submission_date,
      |    CASE WHEN c.alert = sh.alert THEN sh.flag_date ELSE c.flag_date END AS flag_date,
      |    c.alert, sh.validated, sh.validated_when_ymd, sh.comments
      |  FROM cur c JOIN sheet sh ON c.sid = sh.sid),
      |appended AS (
      |  SELECT * FROM merged
      |  UNION ALL
      |  SELECT c.* FROM cur c ANTI JOIN sheet sh ON c.sid = sh.sid)
      |SELECT validated, comments, flag_date, COUNT(*) AS n_rows,
      |  COUNT(validated_when_ymd) AS n_validated_dates,
      |  COUNT(DISTINCT alert) AS n_alert_values
      |FROM appended GROUP BY 1, 2, 3""".stripMargin))

  /** PDS points fixture from `events`: trip = (user, day), epoch-second
    * times, q29's deterministic lat/lng, `value` as speed (m/s). */
  def fixturePdsPoints(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      concat(col("user_id"), lit("-"), dayofmonth(col("ts"))).as("trip"),
      unix_timestamp(col("ts")).as("tsec"),
      (((col("event_id") % 180) - 90).cast("double") * 0.5).as("lat"),
      (((col("event_id") % 360) - 180).cast("double") * 0.25).as("lng"),
      col("value").as("speed_ms"),
      col("event_id").as("ord"))

  /** q82: the PDS-side validation — one-pass track descriptors (exact
    * closed-form time-trace sd, speed-outlier %, start↔end haversine)
    * composed into `validate_pds_data`'s alert/cleaning ladder; census
    * per alert triple. Cut points sit mid-data so every arm fires. */
  val q82 = GQuery(
    "q82_pds_validate",
    (s, d) => {
      import graft.pipeline.ValidatePdsTrips
      val pts = fixturePdsPoints(s, d)
      val desc = ValidatePdsTrips.trackDescriptors(pts, "ord")
      val tripAgg = pts.groupBy(col("trip"))
        .agg(
          (max(col("tsec")) - min(col("tsec"))).cast("double").as("duration_s"),
          timestamp_seconds(min(col("tsec"))).as("started"),
          timestamp_seconds(max(col("tsec"))).as("ended"),
          (dsum(col("speed_ms")) * 50.0).as("distance_m"))
      val trips = tripAgg.join(desc, Seq("trip"))
        .withColumn("se_km3", round(col("start_end_distance") / 1000.0, 3))
      // diagnostics ride the validated projection (carry) — a join-back
      // would evaluate the whole trips subtree twice
      ValidatePdsTrips.validated(trips,
          ValidatePdsTrips.Config(maxHrs = 12.0, minHrs = 0.5, km = 8.0,
            outl = 40.0, timet = 3600.0),
          carry = Seq("outliers_proportion", "timetrace_dispersion", "se_km3"))
        .groupBy(col("alert_duration"), col("alert_distance"), col("alert_quality"))
        .agg(
          lcount(lit(1)).as("n_trips"),
          lsum6(col("tracker_trip_duration")).as("sum_duration"),
          dsum(col("tracker_trip_distance")).as("sum_distance"),
          lcount(col("tracker_trip_start")).as("n_start"),
          lsum6(col("outliers_proportion")).as("sum_outlier_pct"),
          lsum6(col("timetrace_dispersion")).as("sum_dispersion"),
          lsum6(col("se_km3")).as("sum_se_km"))
    },
    Some(s"""WITH pts AS (
      |  SELECT CAST(user_id AS VARCHAR) || '-' || CAST(day(ts) AS VARCHAR) AS trip,
      |    CAST(floor(date_part('epoch', ts)) AS BIGINT) AS tsec,
      |    CAST((event_id % 180) - 90 AS DOUBLE) * 0.5 AS lat,
      |    CAST((event_id % 360) - 180 AS DOUBLE) * 0.25 AS lng,
      |    value AS speed_ms, event_id AS ord
      |  FROM events),
      |dd AS (
      |  SELECT *, tsec - lag(tsec) OVER (PARTITION BY trip ORDER BY ord) AS d
      |  FROM pts),
      |des AS (
      |  SELECT trip,
      |    arg_min(lat, ord) AS lat1, arg_min(lng, ord) AS lng1,
      |    arg_max(lat, ord) AS lat2, arg_max(lng, ord) AS lng2,
      |    SUM(CASE WHEN speed_ms > 30.0 THEN 1 ELSE 0 END) * 100.0 / COUNT(*) AS outp,
      |    SUM(d) AS s1, SUM(d * d) AS s2, COUNT(d) AS n
      |  FROM dd GROUP BY trip),
      |des2 AS (
      |  SELECT trip, outp,
      |    CASE WHEN n > 1 THEN sqrt((CAST(s2 AS DOUBLE) -
      |      CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)) END AS disp,
      |    round(2.0 * 6371.0088 * asin(sqrt(
      |      sin(radians(lat2 - lat1) / 2.0) * sin(radians(lat2 - lat1) / 2.0) +
      |      cos(radians(lat1)) * cos(radians(lat2)) *
      |      sin(radians(lng2 - lng1) / 2.0) * sin(radians(lng2 - lng1) / 2.0))), 3) AS se_km3
      |  FROM des),
      |tripagg AS (
      |  SELECT trip, CAST(MAX(tsec) - MIN(tsec) AS DOUBLE) AS duration_s,
      |    ${dsumSqlV("speed_ms")} * 50.0 AS distance_m
      |  FROM pts GROUP BY trip),
      |v AS (
      |  SELECT t.trip,
      |    CASE WHEN t.duration_s > 12.0 * 3600.0 OR t.duration_s < 0.5 * 3600.0
      |      THEN 8 END AS alert_duration,
      |    CASE WHEN t.distance_m > 8.0 * 1000.0 THEN 9 END AS alert_distance,
      |    CASE WHEN d.outp > 40.0 OR d.disp > 3600.0 THEN 13 END AS alert_quality,
      |    t.duration_s, t.distance_m, d.outp, d.disp, d.se_km3
      |  FROM tripagg t JOIN des2 d ON t.trip = d.trip)
      |SELECT alert_duration, alert_distance, alert_quality,
      |  COUNT(*) AS n_trips,
      |  ${sqlLsum6("CASE WHEN alert_duration IS NULL THEN duration_s END")} AS sum_duration,
      |  CAST(SUM(CAST((CASE WHEN alert_distance IS NULL THEN distance_m END) AS DECIMAL(38,6))) AS DOUBLE) AS sum_distance,
      |  COUNT(CASE WHEN alert_duration IS NULL THEN 1 END) AS n_start,
      |  ${sqlLsum6("outp")} AS sum_outlier_pct,
      |  ${sqlLsum6("disp")} AS sum_dispersion,
      |  ${sqlLsum6("se_km3")} AS sum_se_km
      |FROM v GROUP BY 1, 2, 3""".stripMargin))

  private def dsumSqlV(x: String) =
    s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"

  /** q171: declarative data-contract audit over `orders`
    * ([[graft.core.Expectations.audit]]) — the generic scheduler gate
    * behind the hand-written tinytest/metadata checks: every row rule
    * folds into one map-side-combined scan, uniqueness is one key
    * census, referential integrity one anti-join. The report frame is
    * what a 100 TB nightly run diffs against its contract. */
  val q171 = GQuery(
    "q171_data_contract",
    (s, d) => graft.core.Expectations.audit(
      orders(s, d),
      rowRules = Seq(
        graft.core.Expectations.RowRule("price_range",
          col("o_totalprice") > 0.0 && col("o_totalprice") < 500000.0),
        graft.core.Expectations.RowRule("status_enum",
          col("o_orderstatus").isin("O", "F", "P")),
        graft.core.Expectations.RowRule("date_present",
          col("o_orderdate").isNotNull),
        graft.core.Expectations.RowRule("priority_format",
          col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$"))),
      uniqueKey = Some(Seq("o_orderkey")),
      foreignKeys = Seq(
        ("cust", customer(s, d), "o_custkey", "c_custkey"))),
    Some("""WITH n AS (SELECT COUNT(*) AS n_rows FROM orders),
      |rules AS (
      |  SELECT 'price_range' AS rule, n_rows,
      |    (SELECT COUNT(*) FROM orders
      |     WHERE NOT (o_totalprice > 0.0 AND o_totalprice < 500000.0)
      |        OR o_totalprice IS NULL) AS n_bad FROM n
      |  UNION ALL
      |  SELECT 'status_enum', n_rows,
      |    (SELECT COUNT(*) FROM orders
      |     WHERE o_orderstatus NOT IN ('O', 'F', 'P')
      |        OR o_orderstatus IS NULL) FROM n
      |  UNION ALL
      |  SELECT 'date_present', n_rows,
      |    (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL) FROM n
      |  UNION ALL
      |  SELECT 'priority_format', n_rows,
      |    (SELECT COUNT(*) FROM orders
      |     WHERE NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
      |        OR o_orderpriority IS NULL) FROM n
      |  UNION ALL
      |  SELECT 'unique:o_orderkey', n_rows,
      |    n_rows - (SELECT COUNT(DISTINCT o_orderkey) FROM orders) FROM n
      |  UNION ALL
      |  SELECT 'fk:cust', n_rows,
      |    (SELECT COUNT(*) FROM orders
      |     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) FROM n)
      |SELECT rule, n_rows, CAST(n_bad AS BIGINT) AS n_bad,
      |  ROUND(CAST(n_bad AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS bad_share
      |FROM rules""".stripMargin))

  def queries: Seq[GQuery] = Seq(q72, q73, q82, q171)
}
