package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.functions.Geo
import graft.operators.{Nest, WideNest}

/** Remaining §2 surface: the mean-of-regex-matches name parser (the
  * length-class kernel), findInterval grid binning, and keep_empty
  * outer-unnest semantics.
  */
object MiscQueries {

  /** §2.8/§2.11: mean of all numbers embedded in a column name/string
    * via higher-order functions (`R/pt_nest_species.R:68-70`) — names
    * synthesized from quantities so the golden relation mean = q + 2.5
    * holds. */
  val q45 = GQuery(
    "q45_regex_mean",
    (s, d) => {
      // native MeanDigitRuns expression: the composed regexp+lambda form
      // is CodegenFallback (interpreted per row); this stays inside
      // whole-stage codegen
      graft.functions.MeanDigitRuns.register(s)
      lineitem(s, d)
        .select(col("l_returnflag"),
          concat(lit("no_individuals_"),
            col("l_quantity").cast("int").cast("string"), lit("_"),
            (col("l_quantity").cast("int") + 5).cast("string")).as("name"))
        .withColumn("mean_len", call_function("mean_digit_runs", col("name")))
        .groupBy(col("l_returnflag"))
        .agg(lsum6(col("mean_len")).as("sum_mean_len"), lcount(lit(1)).as("n"))
    },
    Some(s"""WITH named AS (
      |  SELECT l_returnflag,
      |    'no_individuals_' || CAST(CAST(l_quantity AS INT) AS VARCHAR)
      |      || '_' || CAST(CAST(l_quantity AS INT) + 5 AS VARCHAR) AS name
      |  FROM lineitem),
      |m AS (
      |  SELECT l_returnflag,
      |    CAST(list_sum(list_transform(regexp_extract_all(name, '[0-9]+'),
      |      x -> CAST(x AS BIGINT))) AS DOUBLE)
      |    / CAST(len(regexp_extract_all(name, '[0-9]+')) AS DOUBLE) AS mean_len
      |  FROM named)
      |SELECT l_returnflag, ${sqlLsum6("mean_len")} AS sum_mean_len,
      |COUNT(*) AS n
      |FROM m GROUP BY l_returnflag""".stripMargin))

  /** §2.8 geo: findInterval-style regular grid binning
    * (`R/ingest-pds-data.R:389-400`). */
  val q46 = GQuery(
    "q46_grid_bin",
    (s, d) =>
      events(s, d)
        .withColumn("bin", Geo.gridBin(col("value"), origin = 0.0, step = 5.0))
        .groupBy(col("event_type"), col("bin"))
        .agg(lcount(lit(1)).as("n"), lsum6(col("value")).as("sum_value")),
    Some(s"""SELECT event_type,
      |CAST(floor((value - 0.0) / 5.0) AS BIGINT) + 1 AS bin,
      |COUNT(*) AS n, ${sqlLsum6("value")} AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin))

  /** A15 keep_empty: orders with no lineitems survive the outer unnest
    * with null children (`tidyr::unnest(keep_empty = TRUE)`,
    * `R/calculate-weights.R:317-318`) — the synthetic data has 257 such
    * orders. */
  val q47 = GQuery(
    "q47_unnest_keep_empty",
    (s, d) => {
      val nested = Nest.nest(
        lineitem(s, d), keys = Seq("l_orderkey"),
        payload = Seq("l_linenumber", "l_quantity"), orderField = "l_linenumber",
        as = "items")
      val withEmpty = orders(s, d)
        .join(nested, col("o_orderkey") === col("l_orderkey"), "left")
        .drop("l_orderkey")
      Nest.unnest(withEmpty, "items", keepEmpty = true)
        .groupBy(col("o_orderstatus"))
        .agg(
          lcount(lit(1)).as("n_rows"),
          count(when(col("l_linenumber").isNull, lit(1))).as("n_childless"),
          lsum6(col("l_quantity")).as("sum_qty"))
    },
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
      |COUNT(CASE WHEN l_linenumber IS NULL THEN 1 END) AS n_childless,
      |${sqlLsum6("l_quantity")} AS sum_qty
      |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus""".stripMargin))

  /** CCW convex pentagon for q49, in the (lng, lat) plane of the q29
    * synthetic points. Two-decimal vertices + quarter-degree grid points
    * keep every point a safe rational distance from every edge, so the
    * ray-cast (Spark) and cross-product-sign (oracle) classifications
    * cannot disagree through float rounding. */
  val q49Ring: Seq[(Double, Double)] = Seq(
    (-20.13, -25.37), (18.71, -20.11), (27.43, 8.59),
    (0.17, 24.91), (-24.59, 5.23))

  /** §2.8 geo: point-in-polygon zone assignment (`sf::st_within`,
    * `R/ingest-pds-data.R:742-747`) via the native [[graft.functions.PointInRing]]
    * ray-casting expression — a pure projection, no geometry library.
    * The oracle re-derives membership as the all-edges-left sign test,
    * valid because the ring is convex and CCW (asserted in GeoSpec). */
  val q49 = GQuery(
    "q49_point_in_polygon",
    (s, d) => {
      graft.functions.PointInRing.register(s)
      val pts = events(s, d)
        .withColumn("lat", ((col("event_id") % 180) - 90).cast("double") * lit(0.5))
        .withColumn("lng", ((col("event_id") % 360) - 180).cast("double") * lit(0.25))
      val ring = array(q49Ring.flatMap { case (x, y) => Seq(lit(x), lit(y)) }: _*)
      pts
        .withColumn("inside",
          call_function("point_in_ring", col("lng"), col("lat"), ring))
        .groupBy(col("event_type"))
        .agg(
          count(when(col("inside"), lit(1))).as("n_inside"),
          lcount(lit(1)).as("n"),
          lsum6(when(col("inside"), col("value"))).as("sum_inside_value"))
    },
    Some {
      val edges = q49Ring.indices.map { i =>
        val (xi, yi) = q49Ring(i)
        val (xj, yj) = q49Ring((i + 1) % q49Ring.length)
        s"(($xj - $xi) * (lat - $yi) - ($yj - $yi) * (lng - $xi)) > 0"
      }.mkString("\n      AND ")
      s"""WITH pts AS (
         |  SELECT event_type, value,
         |    CAST((event_id % 180) - 90 AS DOUBLE) * 0.5 AS lat,
         |    CAST((event_id % 360) - 180 AS DOUBLE) * 0.25 AS lng
         |  FROM events),
         |flagged AS (
         |  SELECT event_type, value,
         |    ($edges) AS inside
         |  FROM pts)
         |SELECT event_type,
         |COUNT(CASE WHEN inside THEN 1 END) AS n_inside,
         |COUNT(*) AS n,
         |${sqlLsum6("CASE WHEN inside THEN value END")} AS sum_inside_value
         |FROM flagged GROUP BY event_type""".stripMargin
    })

  /** As-of join: every click event picks up the latest earlier view of
    * the same user (`operators/AsOfJoin.backward` — union + one window
    * sort, no pair blow-up; the reference's time-proximity matching,
    * `R/merge-trips.R:35-69`). The oracle is DuckDB's native ASOF LEFT
    * JOIN, an independent implementation of the same semantics. */
  val q52 = GQuery(
    "q52_asof_join",
    (s, d) => {
      val ev = events(s, d)
      // right side unique per (user, ts) so tie-handling is unambiguous
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("view_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsOfJoin.backward(
        clicks, views, keys = Seq("user_id"), tsCol = "ts",
        payload = Seq("view_value"))
        .groupBy(col("user_id"))
        .agg(
          lcount(lit(1)).as("n_clicks"),
          lcount(col("view_value")).as("n_matched"),
          lsum6(col("view_value")).as("sum_view_value"),
          lsum6(col("value")).as("sum_click_value"))
    },
    Some(s"""WITH r AS (
      |  SELECT user_id, ts, MAX(value) AS view_value
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |l AS (
      |  SELECT user_id, ts, value
      |  FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT l.user_id, l.value, r.view_value
      |  FROM l ASOF LEFT JOIN r
      |    ON l.user_id = r.user_id AND l.ts >= r.ts)
      |SELECT user_id, COUNT(*) AS n_clicks,
      |COUNT(view_value) AS n_matched,
      |${sqlLsum6("view_value")} AS sum_view_value,
      |${sqlLsum6("value")} AS sum_click_value
      |FROM j GROUP BY user_id""".stripMargin))

  /** Range join: clicks assigned to each user's daily [first,last] view
    * window via `operators/RangeJoin.pointInInterval` (hour-binned
    * equi-join + exact BETWEEN trim — never |points|·|intervals|).
    * Oracle states the plain BETWEEN join; same row multiset. */
  val q59 = GQuery(
    "q59_range_join",
    (s, d) => {
      val ev = events(s, d)
      val intervals = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(min(col("ts")).as("win_start"), max(col("ts")).as("win_end"))
      val points = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.RangeJoin.pointInInterval(
        points, intervals, keys = Seq("user_id"),
        tsCol = "ts", startCol = "win_start", endCol = "win_end",
        binSeconds = 3600L)
        .groupBy(col("user_id"))
        .agg(
          lcount(lit(1)).as("n_matched"),
          lsum6(col("value")).as("sum_matched_value"),
          countDistinct(col("day")).as("n_days_active"))
    },
    Some(s"""WITH iv AS (
      |  SELECT user_id, date_trunc('day', ts) AS day,
      |    MIN(ts) AS s, MAX(ts) AS e
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |pts AS (
      |  SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
      |m AS (
      |  SELECT p.user_id, p.value, iv.day
      |  FROM pts p JOIN iv ON p.user_id = iv.user_id
      |    AND p.ts BETWEEN iv.s AND iv.e)
      |SELECT user_id, COUNT(*) AS n_matched,
      |${sqlLsum6("value")} AS sum_matched_value,
      |COUNT(DISTINCT day) AS n_days_active
      |FROM m GROUP BY user_id""".stripMargin))

  /** Hot-key salting (`operators/Salting`): the 3-value l_returnflag is
    * the worst-case skew — every row lands on one of three reducers in
    * a direct groupBy; the salted plan splits each key over 16 partial
    * groups (balanced shuffle) and recombines. Scaled-long sums keep
    * the result bit-identical to the unsalted plan and the oracle
    * (int64 addition is associative; the salt only reorders it). */
  val q62 = GQuery(
    "q62_salted_hotkey_agg",
    (s, d) => {
      val out = graft.operators.Salting.saltedAggregate(
        lineitem(s, d), keys = Seq("l_returnflag"),
        aggs = Map(
          "sum_price_scaled" -> (("sum",
            floor(col("l_extendedprice") * lit(1e6) + lit(0.5)).cast("long"))),
          "n" -> (("count", lit(1))),
          "max_qty" -> (("max", col("l_quantity")))),
        numSalts = 16)
      out.select(col("l_returnflag"),
        (col("sum_price_scaled").cast("double") / lit(1e6)).as("sum_price"),
        col("n").cast("long").as("n"),
        col("max_qty"))
    },
    Some(s"""SELECT l_returnflag,
      |${sqlLsum6("l_extendedprice")} AS sum_price,
      |COUNT(*) AS n, MAX(l_quantity) AS max_qty
      |FROM lineitem GROUP BY l_returnflag""".stripMargin))

  /** Convex CCW zones for q63 (convexity asserted in PointInRingSpec):
    * the q49 pentagon plus a square and a triangle elsewhere in the
    * synthetic coordinate space. */
  val q63Zones: Seq[(String, Seq[(Double, Double)])] = Seq(
    "zoneA" -> q49Ring,
    "zoneB" -> Seq((30.17, -40.23), (44.63, -40.23), (44.63, -25.37), (30.17, -25.37)),
    "zoneC" -> Seq((-44.61, 20.13), (-20.39, 25.17), (-30.25, 42.89)))

  /** Spatial join: points against the zone TABLE via
    * `operators/SpatialJoin` (bbox-grid equi-join + exact ray cast —
    * never |points|·|zones|). The oracle re-derives membership per zone
    * with convex sign tests, generated from the same vertex lists. */
  val q63 = GQuery(
    "q63_spatial_join",
    (s, d) => {
      import s.implicits._
      // 179 is coprime to 360, so (lat, lng) sweep the full 2D grid
      // instead of a correlated 1D curve
      val pts = events(s, d)
        .withColumn("lat", ((col("event_id") % 179) - 89).cast("double") * lit(0.5))
        .withColumn("lng", ((col("event_id") % 360) - 180).cast("double") * lit(0.25))
      val polys = q63Zones.map { case (z, vs) =>
        (z, vs.flatMap { case (x, y) => Seq(x, y) })
      }.toDF("zone", "ring")
      graft.operators.SpatialJoin.pointInPolygonJoin(
        pts, polys, xCol = "lng", yCol = "lat", ringCol = "ring", cellSize = 10.0)
        .groupBy(col("zone"))
        .agg(lcount(lit(1)).as("n_points"), lsum6(col("value")).as("sum_value"))
    },
    Some {
      def test(vs: Seq[(Double, Double)]): String =
        vs.indices.map { i =>
          val (xi, yi) = vs(i)
          val (xj, yj) = vs((i + 1) % vs.length)
          s"(($xj - $xi) * (lat - $yi) - ($yj - $yi) * (lng - $xi)) > 0"
        }.mkString("(", "\n      AND ", ")")
      val unions = q63Zones.map { case (z, vs) =>
        s"SELECT '$z' AS zone, value FROM pts WHERE ${test(vs)}"
      }.mkString("\n  UNION ALL ")
      s"""WITH pts AS (
         |  SELECT value,
         |    CAST((event_id % 179) - 89 AS DOUBLE) * 0.5 AS lat,
         |    CAST((event_id % 360) - 180 AS DOUBLE) * 0.25 AS lng
         |  FROM events),
         |m AS (
         |  $unions)
         |SELECT zone, COUNT(*) AS n_points, ${sqlLsum6("value")} AS sum_value
         |FROM m GROUP BY zone""".stripMargin
    })

  /** Custom aggregate function: `top_k_min` (TypedImperativeAggregate,
    * bounded k-element heap buffer — constant memory per group with
    * map-side partials, where collect_list+sort+slice buffers whole
    * groups). The oracle states the same semantics with a sorted-list
    * slice. */
  val q64 = GQuery(
    "q64_topk_aggregate",
    (s, d) => {
      graft.functions.TopKMin.register(s)
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(call_function("top_k_min", col("l_extendedprice"), lit(5)).as("tops"))
        .select(col("l_returnflag"), posexplode(col("tops")).as(Seq("pos", "price")))
        .select(col("l_returnflag"), (col("pos") + 1).cast("long").as("pos"), col("price"))
    },
    Some("""WITH t AS (
      |  SELECT l_returnflag,
      |    array_agg(l_extendedprice ORDER BY l_extendedprice)[1:5] AS tops
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, CAST(generate_subscripts(tops, 1) AS BIGINT) AS pos,
      |unnest(tops) AS price
      |FROM t""".stripMargin))

  /** Cardinality sketch, exactly checkable: a KMV (k-minimum-values)
    * distinct estimate per group. Unlike HLL (whose register layout is
    * engine-specific), KMV over a portable hash is bit-reproducible:
    * both engines md5 the key, map the first 8 hex chars to a fraction
    * of 2^32, and estimate distinct = (k−1)/h_(k) from the k-th smallest
    * distinct hash — so the oracle hash-matches while the operator is a
    * GENUINE bounded sketch: [[graft.functions.KMinHashes]] keeps the k
    * smallest distinct hashes inside a constant-size aggregation buffer
    * (map-side partials, set-merge on combine) — no global distinct
    * pre-pass, no per-group window sort, one shuffle of k-element
    * states. Hex md5 order ≡ numeric hash order, so the k-th element's
    * 8-char prefix is exactly the window form's rn=k frac (prefix ties
    * are distinct full hashes and keep multiplicity). The exact count
    * column rides the same aggregate as count(distinct). */
  val q67 = GQuery(
    "q67_kmv_distinct",
    (s, d) => {
      val k = 64
      graft.functions.KMinHashes.register(s)
      events(s, d)
        .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
        .groupBy(col("event_type"))
        .agg(
          call_function("k_min_hashes", col("h"), lit(k)).as("tops"),
          countDistinct(col("h")).as("n_distinct_exact"))
        .select(col("event_type"),
          round(
            when(col("n_distinct_exact") >= k,
              lit(k - 1.0) /
                (conv(substring(element_at(col("tops"), k), 1, 8), 16, 10)
                  .cast("double") / lit(4294967296.0)))
              .otherwise(col("n_distinct_exact").cast("double")), 6).as("est_distinct"),
          col("n_distinct_exact"))
    },
    Some("""WITH hashes AS (
      |  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events),
      |frac AS (
      |  SELECT event_type, (
      |    (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456.0 +
      |    (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216.0 +
      |    (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576.0 +
      |    (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536.0 +
      |    (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096.0 +
      |    (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256.0 +
      |    (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16.0 +
      |    (strpos('0123456789abcdef', substr(h, 8, 1)) - 1) * 1.0
      |  ) / 4294967296.0 AS frac
      |  FROM hashes),
      |w AS (
      |  SELECT event_type, frac,
      |    row_number() OVER (PARTITION BY event_type ORDER BY frac) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS nd
      |  FROM frac)
      |SELECT event_type,
      |round(CASE WHEN MAX(nd) >= 64 THEN 63.0 / MAX(CASE WHEN rn = 64 THEN frac END)
      |      ELSE CAST(MAX(nd) AS DOUBLE) END, 6) AS est_distinct,
      |CAST(MAX(nd) AS BIGINT) AS n_distinct_exact
      |FROM w WHERE rn <= 64 GROUP BY event_type""".stripMargin))

  /** Data-layout clustering: Z-order (Morton) keys over a 256×256 geo
    * grid, rolled up per 1024-cell z-range tile. Writing a 100 TB geo
    * table sorted by [[Geo.zorderKey]] makes every parquet row group a
    * compact 2-D tile, so lat AND lng range predicates both prune via
    * min/max zone maps — the layout half of the spatial story
    * ([[graft.operators.SpatialJoin]] being the join half). The oracle
    * replays the bit interleave with the same shift/mask arithmetic. */
  val q69 = GQuery(
    "q69_zorder_cluster",
    (s, d) => {
      val pts = events(s, d).select(
        (((col("event_id") % 180) - 90).cast("double") * lit(0.5)).as("lat"),
        (((col("event_id") % 360) - 180).cast("double") * lit(0.25)).as("lng"),
        col("value"))
      val grid = pts.select(
        Geo.gridCell(col("lat"), -90.0, 90.0, 8).as("gx"),
        Geo.gridCell(col("lng"), -180.0, 180.0, 8).as("gy"),
        col("value"))
      grid
        .withColumn("zkey", Geo.zorderKey(col("gx"), col("gy"), 8))
        .groupBy(shiftright(col("zkey"), 10).as("tile"))
        .agg(
          lcount(lit(1)).as("n"),
          countDistinct(col("zkey")).as("n_cells"),
          min(col("zkey")).as("zmin"),
          max(col("zkey")).as("zmax"),
          round(lsum6(col("value")), 6).as("total"))
    },
    Some {
      val terms = (0 until 8).map { i =>
        s"(((gx >> $i) & 1) * ${1L << (2 * i + 1)}) + (((gy >> $i) & 1) * ${1L << (2 * i)})"
      }.mkString(" + ")
      s"""WITH pts AS (
      |  SELECT CAST((event_id % 180) - 90 AS DOUBLE) * 0.5 AS lat,
      |    CAST((event_id % 360) - 180 AS DOUBLE) * 0.25 AS lng, value
      |  FROM events),
      |grid AS (
      |  SELECT LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 256.0) AS BIGINT), 0), 255) AS gx,
      |    LEAST(GREATEST(CAST(floor((lng + 180.0) / 360.0 * 256.0) AS BIGINT), 0), 255) AS gy,
      |    value
      |  FROM pts),
      |z AS (SELECT ($terms) AS zkey, value FROM grid)
      |SELECT zkey >> 10 AS tile, COUNT(*) AS n,
      |CAST(COUNT(DISTINCT zkey) AS BIGINT) AS n_cells,
      |MIN(zkey) AS zmin, MAX(zkey) AS zmax,
      |round(${sqlLsum6("value")}, 6) AS total
      |FROM z GROUP BY 1""".stripMargin
    })

  /** Multimodal binary-column plumbing under the hash gate: documents
    * synthesize variable-length binary payloads (1–8 md5-prefix bytes),
    * [[graft.multimodal.Multimodal.withMeta]] runs the batched
    * per-partition decode pass (the mapInPandas-shaped stage) with the
    * SQL-replayable [[graft.multimodal.Multimodal.HexFakeDecoder]] stub,
    * and the metadata rolls up per (lang, channels). The oracle
    * re-derives width/height/channels from `md5(upper(hex(payload)))`
    * byte-for-byte — so the whole binary pipeline, not just its schema,
    * is correctness-checked. */
  val q71 = GQuery(
    "q71_multimodal_meta",
    (s, d) => {
      val payloads = documents(s, d).select(
        col("doc_id"), col("lang"),
        expr("unhex(substring(md5(text), 1, cast(2 * (1 + n_chars % 8) as int)))")
          .as("payload"))
      graft.multimodal.Multimodal.withMeta(payloads, "payload", "meta",
          graft.multimodal.Multimodal.HexFakeDecoder)
        .groupBy(col("lang"), col("meta.channels").as("channels"))
        .agg(
          lcount(lit(1)).as("n"),
          sum(col("meta.width")).cast("long").as("sum_width"),
          sum(col("meta.height")).cast("long").as("sum_height"),
          sum(col("meta.n_bytes")).as("sum_bytes"))
    },
    Some("""WITH p AS (
      |  SELECT doc_id, lang,
      |    unhex(substr(md5(text), 1, CAST(2 * (1 + n_chars % 8) AS INT))) AS payload
      |  FROM documents),
      |m AS (
      |  SELECT lang, octet_length(payload) AS n_bytes,
      |    md5(upper(hex(payload))) AS h
      |  FROM p),
      |b AS (
      |  SELECT lang, n_bytes,
      |    (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS b0,
      |    (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) AS b1,
      |    (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16 +
      |    (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) AS b2
      |  FROM m)
      |SELECT lang, CAST(1 + (b2 % 4) AS INT) AS channels, COUNT(*) AS n,
      |CAST(SUM(64 + (b0 % 128)) AS BIGINT) AS sum_width,
      |CAST(SUM(64 + (b1 % 128)) AS BIGINT) AS sum_height,
      |CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes
      |FROM b GROUP BY 1, 2""".stripMargin))

  /** q148: binary-payload exact dedup — the multimodal arm of q36:
    * attachments/images dedup on their content hash (md5 over the hex
    * spelling, the q71 digest convention), never on filename or id.
    * The fixture reuses q71's synthesized payloads and plants a
    * "re-upload" of every fourth payload under a new id; the census
    * bills per-language payload counts, distinct contents, and the
    * byte savings exact dedup recovers (bytes_total − bytes_kept).
    * One hash aggregation + a broadcast-back verdict join — the same
    * two-shuffle shape as q36 at any corpus size. */
  val q148 = GQuery(
    "q148_payload_dedup",
    (s, d) => {
      val payloads = documents(s, d).select(
        col("doc_id"), col("lang"),
        expr("unhex(substring(md5(text), 1, cast(2 * (1 + n_chars % 8) as int)))")
          .as("payload"))
      val union = payloads.unionByName(
        payloads.filter(col("doc_id") % 4 === 0)
          .withColumn("doc_id", col("doc_id") + 100000))
      val keyed = union.withColumn("__key", md5(upper(hex(col("payload")))))
        .withColumn("__bytes", length(col("payload")).cast("long"))
      val groups = graft.dedup.Dedup.exact(keyed, col("__key"), "doc_id")
        .withColumnRenamed("content_key", "__key")
      keyed.join(groups, Seq("__key"))
        .withColumn("is_kept", col("doc_id") === col("keep_id"))
        .groupBy(col("lang"))
        .agg(
          lcount(lit(1)).as("n_payloads"),
          countDistinct(col("__key")).as("n_contents"),
          lcount(when(col("is_kept"), 1)).as("n_kept"),
          sum(col("__bytes")).as("bytes_total"),
          sum(when(col("is_kept"), col("__bytes"))).as("bytes_kept"),
          sum(when(col("is_kept"), col("doc_id"))).as("kept_id_sum"))
    },
    Some("""WITH p AS (
      |  SELECT doc_id, lang,
      |    unhex(substr(md5(text), 1, CAST(2 * (1 + n_chars % 8) AS INT))) AS payload
      |  FROM documents),
      |u AS (
      |  SELECT doc_id, lang, payload FROM p
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, lang, payload FROM p WHERE doc_id % 4 = 0),
      |k AS (
      |  SELECT doc_id, lang, md5(upper(hex(payload))) AS key,
      |    octet_length(payload) AS bytes
      |  FROM u),
      |g AS (SELECT key, MIN(doc_id) AS keep_id FROM k GROUP BY key)
      |SELECT k.lang, COUNT(*) AS n_payloads,
      |  COUNT(DISTINCT k.key) AS n_contents,
      |  COUNT(CASE WHEN k.doc_id = g.keep_id THEN 1 END) AS n_kept,
      |  CAST(SUM(k.bytes) AS BIGINT) AS bytes_total,
      |  CAST(SUM(CASE WHEN k.doc_id = g.keep_id THEN k.bytes END) AS BIGINT) AS bytes_kept,
      |  CAST(SUM(CASE WHEN k.doc_id = g.keep_id THEN k.doc_id END) AS BIGINT) AS kept_id_sum
      |FROM k JOIN g ON k.key = g.key
      |GROUP BY k.lang""".stripMargin))

  /** q155: uniform frame-sampling manifest over video-like payloads
    * ([[graft.multimodal.Multimodal.sampleFrames]]) — payloads are
    * md5-repeat synthesized (16–128 bytes), treated as 8-byte frames,
    * and each gets k=4 uniformly-spaced samples; the manifest rolls up
    * per (lang, frame_no) with a distinct-fingerprint census and a
    * sig checksum. The oracle re-slices the same frames out of the hex
    * spelling and re-derives every fingerprint — the sampling
    * arithmetic AND the slice content sit under the hash gate. */
  val q155 = GQuery(
    "q155_frame_sample_manifest",
    (s, d) => {
      val payloads = documents(s, d).select(
        col("doc_id"), col("lang"),
        expr("unhex(repeat(md5(text), cast(1 + n_chars % 8 as int)))").as("payload"))
      val manifest = graft.multimodal.Multimodal.sampleFrames(
        payloads, "doc_id", "payload", frameBytes = 8, k = 4)
      manifest
        .join(broadcast(documents(s, d).select(col("doc_id"), col("lang"))),
          Seq("doc_id"))
        .groupBy(col("lang"), col("frame_no"))
        .agg(
          lcount(lit(1)).as("n"),
          countDistinct(conv(substring(col("frame_sig"), 1, 7), 16, 10)
            .cast("long")).cast("long").as("n_distinct"),
          sum(col("byte_offset")).as("offset_sum"),
          sum(conv(substring(col("frame_sig"), 1, 7), 16, 10).cast("long"))
            .as("sig_sum"))
    },
    Some("""WITH p AS (
      |  SELECT doc_id, lang, upper(repeat(md5(text), 1 + n_chars % 8)) AS hx
      |  FROM documents),
      |f AS (SELECT doc_id, lang, (length(hx) // 2) // 8 AS nf, hx FROM p),
      |s AS (
      |  SELECT doc_id, lang, j.j AS frame_no, (j.j * nf) // 4 AS frame_idx, hx
      |  FROM f, UNNEST(generate_series(0, 3)) AS j(j)
      |  WHERE nf > 0),
      |m AS (
      |  SELECT lang, frame_no, frame_idx * 8 AS byte_offset,
      |    CAST(('0x' || substr(md5(substr(hx, CAST(frame_idx * 16 + 1 AS INT), 16)), 1, 7))
      |      AS BIGINT) AS sig
      |  FROM s)
      |SELECT lang, CAST(frame_no AS INT) AS frame_no, COUNT(*) AS n,
      |  CAST(COUNT(DISTINCT sig) AS BIGINT) AS n_distinct,
      |  CAST(SUM(byte_offset) AS BIGINT) AS offset_sum,
      |  CAST(SUM(sig) AS BIGINT) AS sig_sum
      |FROM m GROUP BY lang, frame_no""".stripMargin))

  /** q170: key-skew diagnosis report — the planning pass run BEFORE a
    * big join/agg at scale to decide whether to salt (q62's operator)
    * and by how much. Per-key row counts binned into exact power-of-2
    * buckets (floor(log2 n) via binary-string length — no float log
    * near bucket edges), each bucket's key census and row share, and
    * a salt hint = ceil(bucket max / global mean rows-per-key). Two
    * aggregations + a broadcast of the one-row total; the per-key agg
    * is map-side combined so the shuffle carries |keys| partials. */
  val q170 = GQuery(
    "q170_skew_report",
    (s, d) => {
      val perKey = orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      val tot = perKey.agg(
        sum(col("n")).as("rows_total"), count(lit(1)).as("keys_total"))
      perKey
        .withColumn("bucket", (length(bin(col("n"))) - 1).cast("long"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_keys"),
          min(col("n")).as("min_n"),
          max(col("n")).as("max_n"),
          sum(col("n")).as("bucket_rows"))
        .crossJoin(broadcast(tot))
        .select(
          col("bucket"), col("n_keys"), col("min_n"), col("max_n"),
          col("bucket_rows"),
          round(col("bucket_rows").cast("double") /
            col("rows_total").cast("double"), 6).as("row_share"),
          greatest(lit(1L),
            ceil(col("max_n").cast("double") * col("keys_total").cast("double") /
              col("rows_total").cast("double")).cast("long")).as("salt_hint"))
    },
    Some("""WITH pk AS (
      |  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
      |tot AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS rows_total, COUNT(*) AS keys_total FROM pk),
      |b AS (
      |  SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bucket, n FROM pk)
      |SELECT b.bucket, COUNT(*) AS n_keys,
      |  MIN(n) AS min_n, MAX(n) AS max_n,
      |  CAST(SUM(n) AS BIGINT) AS bucket_rows,
      |  ROUND(CAST(SUM(n) AS BIGINT) / CAST(rows_total AS DOUBLE), 6) AS row_share,
      |  GREATEST(1, CAST(CEIL(CAST(MAX(n) AS DOUBLE) * CAST(keys_total AS DOUBLE)
      |    / CAST(rows_total AS DOUBLE)) AS BIGINT)) AS salt_hint
      |FROM b CROSS JOIN tot
      |GROUP BY b.bucket, tot.rows_total, tot.keys_total""".stripMargin))

  /** q177: cross-modal alignment filtering — the LAION/CLIP-score
    * curation step: per (text, image) pair, an alignment score between
    * the text embedding and the image embedding gates the pair, and
    * the census reports keep rates per language. The image side runs
    * through the REAL multimodal plumbing
    * ([[graft.multimodal.Multimodal.extractFeatures]], a partition-
    * local batched decode behind the Decoder seam — the stub derives
    * features from the payload's md5, a CLIP tower drops in without
    * touching the plan); the text side is a literal md5-byte embedding
    * stub. Features are integer-exact (byte−128), the score an int64
    * dot product, so the stub pipeline is hash-gated end-to-end — the
    * SQL oracle re-derives both towers and every score. */
  val q177 = GQuery(
    "q177_crossmodal_align",
    (s, d) => {
      val docs = documents(s, d)
      val payloads = docs.select(
        col("doc_id"), col("lang"),
        expr("unhex(substring(md5(text), 1, cast(2 * (1 + n_chars % 8) as int)))")
          .as("payload"))
      val img = graft.multimodal.Multimodal.extractFeatures(
          graft.core.Widen.widen(payloads), "doc_id", "payload", dim = 8,
          graft.multimodal.Multimodal.HexFakeDecoder)
        .select(col("doc_id"),
          transform(col("features"), f => round(f * 128).cast("long")).as("iv"))
      val txt = docs.select(col("doc_id"), col("lang"),
        array((0 until 8).map(i =>
          conv(substring(md5(col("text")), 2 * i + 1, 2), 16, 10).cast("long")
            - 128): _*).as("tv"))
      txt.join(img, Seq("doc_id"))
        .withColumn("score",
          aggregate(zip_with(col("iv"), col("tv"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x))
        .groupBy(col("lang"))
        .agg(
          lcount(lit(1)).as("n_pairs"),
          sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_aligned"),
          sum(col("score")).as("score_sum"),
          min(col("score")).as("score_min"),
          max(col("score")).as("score_max"))
    },
    Some {
      def bytes(h: String, v: String) = (0 until 8).map(i =>
        s"CAST(('0x' || substr($h, ${2 * i + 1}, 2)) AS BIGINT) - 128 AS $v$i").mkString(", ")
      val dot = (0 until 8).map(i => s"i$i * t$i").mkString(" + ")
      s"""WITH p AS (
      |  SELECT doc_id, lang,
      |    md5(upper(hex(unhex(substr(md5(text), 1, CAST(2 * (1 + n_chars % 8) AS INT)))))) AS hi,
      |    md5(text) AS ht
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, lang, ${bytes("hi", "i")}, ${bytes("ht", "t")} FROM p),
      |sc AS (SELECT lang, $dot AS score FROM f)
      |SELECT lang, COUNT(*) AS n_pairs,
      |  CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_aligned,
      |  CAST(SUM(score) AS BIGINT) AS score_sum,
      |  MIN(score) AS score_min, MAX(score) AS score_max
      |FROM sc GROUP BY lang""".stripMargin
    })

  /** q187: interval×interval overlap join
    * ([[graft.operators.RangeJoin.intervalOverlap]]) — the
    * segment-matching primitive q59's point-in-interval form cannot
    * express. Both sides bin-explode and equi-join on (key, bin); a
    * pair survives only in the first shared bin, so bin-edge
    * duplicates are eliminated WITHOUT a distinct over the pair set.
    * The oracle is the plain range-predicate join (DuckDB IEJoin) —
    * same semantics, independent physical strategy. Census: per key,
    * pair count and exact int64-µs overlap mass. */
  val q187 = GQuery(
    "q187_interval_overlap",
    (s, d) => {
      val H = 3600000000L // µs per hour
      def iv(shift: Int, lenMod: Int) = orders(s, d).select(
        (col("o_custkey") % 50).as("k"),
        timestamp_micros(expr("unix_micros(timestamp(o_orderdate))") +
          (col("o_orderkey") % shift) * H).as("s0"),
        timestamp_micros(expr("unix_micros(timestamp(o_orderdate))") +
          (col("o_orderkey") % shift + col("o_orderkey") % lenMod + 1) * H).as("e0"))
      val joined = graft.operators.RangeJoin.intervalOverlap(
        iv(24, 48), iv(36, 24), Seq("k"), "s0", "e0", binSeconds = 86400)
      joined.select(col("k"),
          (least(unix_micros(col("e0")), unix_micros(col("e0_r"))) -
            greatest(unix_micros(col("s0")), unix_micros(col("s0_r"))))
            .as("ov_us"))
        .groupBy(col("k"))
        .agg(
          lcount(lit(1)).as("n_pairs"),
          sum(col("ov_us")).as("overlap_us"),
          max(col("ov_us")).as("max_overlap_us"))
    },
    Some("""WITH a AS (
      |  SELECT o_custkey % 50 AS k,
      |    CAST(o_orderdate AS TIMESTAMP) + INTERVAL 1 HOUR * (o_orderkey % 24) AS s0,
      |    CAST(o_orderdate AS TIMESTAMP) + INTERVAL 1 HOUR * (o_orderkey % 24 + o_orderkey % 48 + 1) AS e0
      |  FROM orders),
      |b AS (
      |  SELECT o_custkey % 50 AS k,
      |    CAST(o_orderdate AS TIMESTAMP) + INTERVAL 1 HOUR * (o_orderkey % 36) AS s0,
      |    CAST(o_orderdate AS TIMESTAMP) + INTERVAL 1 HOUR * (o_orderkey % 36 + o_orderkey % 24 + 1) AS e0
      |  FROM orders),
      |p AS (
      |  SELECT a.k,
      |    epoch_us(least(a.e0, b.e0)) - epoch_us(greatest(a.s0, b.s0)) AS ov_us
      |  FROM a JOIN b ON a.k = b.k AND a.s0 <= b.e0 AND b.s0 <= a.e0)
      |SELECT k, COUNT(*) AS n_pairs,
      |  CAST(SUM(ov_us) AS BIGINT) AS overlap_us,
      |  CAST(MAX(ov_us) AS BIGINT) AS max_overlap_us
      |FROM p GROUP BY k""".stripMargin))

  /** q192: Z-order (Morton) layout census ([[graft.functions.ZOrder]])
    * — the lakehouse file-clustering key behind `OPTIMIZE ZORDER BY`:
    * 10-bit grid bins per axis, bits interleaved into one sort key,
    * right-shifted to a quadtree cell id (here 5 bits per axis = a
    * 32×32 layout), then a per-cell census of the bounding box each
    * "file" would cover — the tight boxes ARE the point, since
    * parquet min/max stats on them turn spatial range scans into
    * file-pruned scans. The oracle replays the magic-number bit
    * dilation shift for shift; spans are e6-floored. ZOrderSpec
    * additionally proves the tightness win over hash layout. */
  val q192 = GQuery(
    "q192_zorder_layout",
    (s, d) => {
      import graft.functions.ZOrder
      val pts = events(s, d)
        .withColumn("lat", ((col("event_id") % 179) - 89).cast("double") * lit(0.5))
        .withColumn("lng", ((col("event_id") % 360) - 180).cast("double") * lit(0.25))
        .withColumn("__bx", floor((col("lng") + 180.0) / 360.0 * 1023.0).cast("long"))
        .withColumn("__by", floor((col("lat") + 90.0) / 180.0 * 1023.0).cast("long"))
        .withColumn("__z", ZOrder.zValue(col("__bx"), col("__by")))
      pts.groupBy(shiftright(col("__z"), 10).as("cell"))
        .agg(
          lcount(lit(1)).as("n_points"),
          min(col("__z")).as("z_min"),
          max(col("__z")).as("z_max"),
          floor((max(col("lng")) - min(col("lng"))) * 1e6 + 0.5).cast("long").as("lng_span_e6"),
          floor((max(col("lat")) - min(col("lat"))) * 1e6 + 0.5).cast("long").as("lat_span_e6"))
    },
    Some("""WITH pts AS (
      |  SELECT ((event_id % 179) - 89) * 0.5 AS lat,
      |         ((event_id % 360) - 180) * 0.25 AS lng
      |  FROM events),
      |bins AS (
      |  SELECT lat, lng,
      |    CAST(FLOOR((lng + 180.0) / 360.0 * 1023.0) AS BIGINT) AS bx,
      |    CAST(FLOOR((lat + 90.0) / 180.0 * 1023.0) AS BIGINT) AS by
      |  FROM pts),
      |sx AS (
      |  SELECT lat, lng, by,
      |    ((bx | (bx << 16)) & 281470681808895) AS x1
      |  FROM bins),
      |sx2 AS (SELECT lat, lng, by,
      |    ((x1 | (x1 << 8)) & 71777214294589695) AS x2 FROM sx),
      |sx3 AS (SELECT lat, lng, by,
      |    ((x2 | (x2 << 4)) & 1085102592571150095) AS x3 FROM sx2),
      |sx4 AS (SELECT lat, lng, by,
      |    ((x3 | (x3 << 2)) & 3689348814741910323) AS x4 FROM sx3),
      |sxf AS (SELECT lat, lng, by,
      |    ((x4 | (x4 << 1)) & 6148914691236517205) AS sx FROM sx4),
      |sy AS (SELECT lat, lng, sx,
      |    ((by | (by << 16)) & 281470681808895) AS y1 FROM sxf),
      |sy2 AS (SELECT lat, lng, sx,
      |    ((y1 | (y1 << 8)) & 71777214294589695) AS y2 FROM sy),
      |sy3 AS (SELECT lat, lng, sx,
      |    ((y2 | (y2 << 4)) & 1085102592571150095) AS y3 FROM sy2),
      |sy4 AS (SELECT lat, lng, sx,
      |    ((y3 | (y3 << 2)) & 3689348814741910323) AS y4 FROM sy3),
      |z AS (SELECT lat, lng,
      |    (sx | (((y4 | (y4 << 1)) & 6148914691236517205) << 1)) AS z
      |  FROM sy4)
      |SELECT z >> 10 AS cell, COUNT(*) AS n_points,
      |  MIN(z) AS z_min, MAX(z) AS z_max,
      |  CAST(FLOOR((MAX(lng) - MIN(lng)) * 1e6 + 0.5) AS BIGINT) AS lng_span_e6,
      |  CAST(FLOOR((MAX(lat) - MIN(lat)) * 1e6 + 0.5) AS BIGINT) AS lat_span_e6
      |FROM z GROUP BY 1""".stripMargin))

  /** q198: perceptual-hash (dHash) image near-dup
    * ([[graft.multimodal.ImageHash]]) — the multimodal arm of the
    * near-dup family: 64-bit difference hash over the stubbed 8×9
    * grayscale grid, 4 × 16-bit band keys (pigeonhole-exact for
    * Hamming ≤ 3), exact bit_count(xor) verify on band-collision
    * candidates only. Fixture plants byte-identical twin payloads
    * (doc_id % 7 = 0, re-keyed +100000) that must pair at Hamming 0;
    * random payloads only meet through 16-bit band collisions and die
    * at the verify. The oracle replays the md5 keystream, all 64 bit
    * comparisons, the banding and the Hamming filter byte-for-byte. */
  /** SQL spelling of the 64 dHash bit comparisons over the md5
    * keystream hex (shared by q198/q199). */
  private val q198BitSum: String = {
    def byteSql(k: Int): String = {
      val blk = k / 16; val off = 2 * (k % 16) + 1
      s"((strpos('0123456789abcdef', substr(h$blk, $off, 1)) - 1) * 16 + " +
        s"(strpos('0123456789abcdef', substr(h$blk, ${off + 1}, 1)) - 1))"
    }
    (for (r <- 0 until 8; c <- 0 until 8) yield {
      val i = r * 9 + c
      s"CASE WHEN ${byteSql(i + 1)} > ${byteSql(i)} " +
        s"THEN CAST(${1L << (r * 8 + c)} AS BIGINT) ELSE 0 END"
    }).mkString(" + ")
  }

  val q198 = {
    val bitSum = q198BitSum
    GQuery(
      "q198_image_dhash_neardup",
      (s, d) => {
        val base = documents(s, d).select(col("doc_id"),
          expr("unhex(substring(md5(text), 1, cast(2 * (1 + n_chars % 8) as int)))")
            .as("payload"))
        val twins = base.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 100000L)
        graft.multimodal.ImageHash.nearDupPairs(
          base.unionByName(twins), "doc_id", "payload", maxHamming = 3)
      },
      Some(s"""WITH p0 AS (
        |  SELECT doc_id,
        |    unhex(substr(md5(text), 1, CAST(2 * (1 + n_chars % 8) AS INT))) AS payload
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, payload FROM p0
        |  UNION ALL
        |  SELECT doc_id + 100000, payload FROM p0 WHERE doc_id % 7 = 0),
        |hx AS (SELECT doc_id, upper(hex(payload)) AS hx FROM p),
        |hs AS (
        |  SELECT doc_id, md5(hx || ':0') AS h0, md5(hx || ':1') AS h1,
        |    md5(hx || ':2') AS h2, md5(hx || ':3') AS h3, md5(hx || ':4') AS h4
        |  FROM hx),
        |dh AS (SELECT doc_id, $bitSum AS h FROM hs),
        |bands AS (
        |  SELECT doc_id, h, u.b, (h >> (16 * u.b)) & 65535 AS bkey
        |  FROM dh, UNNEST(generate_series(0, 3)) AS u(b)),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |    bit_count(xor(x.h, y.h)) AS hamming
        |  FROM bands x JOIN bands y
        |    ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
        |SELECT a, b, CAST(hamming AS INT) AS hamming
        |FROM cand WHERE hamming <= 3""".stripMargin))
  }

  /** q199: incremental image near-dup — the landed-index discipline
    * (q88/q142/q151) on the image key: the batch (doc_id % 3 = 0,
    * plus planted twins of landed payloads) probes the landed
    * [[graft.multimodal.ImageHash.bandIndex]] for band collisions and
    * adds its own internal collisions; landed-internal pairs are
    * never re-reported. Twins of LANDED payloads must surface as
    * vs_corpus hits at Hamming 0 — the "this image already landed"
    * verdict. Work tracks the batch; at scale the landed index lives
    * bucketed by (band, bkey). */
  val q199 = GQuery(
    "q199_incremental_image_neardup",
    (s, d) => {
      import graft.multimodal.ImageHash
      val base = documents(s, d).select(col("doc_id"),
        expr("unhex(substring(md5(text), 1, cast(2 * (1 + n_chars % 8) as int)))")
          .as("payload"))
      val landed = base.filter(col("doc_id") % 3 =!= 0)
      // batch: the fresh third, plus twins of LANDED payloads (re-keyed)
      val batch = base.filter(col("doc_id") % 3 === 0)
        .unionByName(landed.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 100000L))
      ImageHash.incrementalNearDups(batch,
        ImageHash.bandIndex(landed, "doc_id", "payload"),
        "doc_id", "payload", maxHamming = 3)
    },
    Some(s"""WITH p0 AS (
      |  SELECT doc_id,
      |    unhex(substr(md5(text), 1, CAST(2 * (1 + n_chars % 8) AS INT))) AS payload
      |  FROM documents),
      |landed0 AS (SELECT doc_id, payload FROM p0 WHERE doc_id % 3 <> 0),
      |batch0 AS (
      |  SELECT doc_id, payload FROM p0 WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 100000, payload FROM landed0 WHERE doc_id % 7 = 0),
      |allp AS (SELECT * FROM landed0 UNION ALL SELECT * FROM batch0),
      |hx AS (SELECT doc_id, upper(hex(payload)) AS hx FROM allp),
      |hs AS (
      |  SELECT doc_id, md5(hx || ':0') AS h0, md5(hx || ':1') AS h1,
      |    md5(hx || ':2') AS h2, md5(hx || ':3') AS h3, md5(hx || ':4') AS h4
      |  FROM hx),
      |dh AS (SELECT doc_id, ${q198BitSum} AS h FROM hs),
      |bands AS (
      |  SELECT doc_id, h, u.b, (h >> (16 * u.b)) & 65535 AS bkey
      |  FROM dh, UNNEST(generate_series(0, 3)) AS u(b)),
      |bb AS (SELECT * FROM bands WHERE doc_id IN (SELECT doc_id FROM batch0)),
      |bl AS (SELECT * FROM bands WHERE doc_id IN (SELECT doc_id FROM landed0)),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
      |    bit_count(xor(x.h, y.h)) AS hamming, TRUE AS vs_corpus
      |  FROM bb x JOIN bl y
      |    ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id <> y.doc_id
      |  UNION
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
      |    bit_count(xor(x.h, y.h)) AS hamming, FALSE AS vs_corpus
      |  FROM bb x JOIN bb y
      |    ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
      |SELECT a, b, CAST(hamming AS INT) AS hamming, vs_corpus
      |FROM cand WHERE hamming <= 3""".stripMargin))

  /** q214: blocked fuzzy record linkage via the native [[
    * graft.functions.JaroWinklerExpr]] — the Fellegi–Sunter comparison
    * step at its scale shape: candidate pairs come ONLY from equality
    * blocking (6-char name prefix + exact length — one equi-join, never
    * all-pairs), each pair scored by the codegen'd Jaro–Winkler kernel
    * (bit-checked against DuckDB's jaro_winkler_similarity), matches at
    * the e6-floored 0.94 threshold. Per block: candidate mass, match
    * mass, score checksum — the census a linkage run uses to size its
    * clerical-review queue. Skewed blocks (shared first words) are the
    * q170 salting case at 100 TB. */
  /** The (k, nm, blk) linkage frame and the scored equality-block
    * MATCH table three queries share: q214 LANDS the matches
    * ([[graft.core.Landed]] — scoring every block pair once per
    * suite), q254 probes them as entity edges and q256 as the
    * blocking pass to beat. */
  private def linkageParts(s: org.apache.spark.sql.SparkSession, d: String) =
    part(s, d).select(
      col("p_partkey").as("k"),
      concat(col("p_name"), lit(" "), lower(col("p_type"))).as("nm"),
      concat(substring(col("p_name"), 1, 6),
        length(col("p_name")).cast("string")).as("blk"))

  /** The landing's build plan — `private[graft]` so Round8PlanSpec
    * can keep its blocking-equi-join/native-kernel gate on the plan
    * that actually scores pairs (the landed q214 plan only scans the
    * materialized result). */
  private[graft] def jwBlockMatchesBuild(s: org.apache.spark.sql.SparkSession,
                                         d: String) = {
    graft.functions.JaroWinkler.register(s)
    val p = linkageParts(s, d)
    p.select(col("blk"), col("k").as("ka"), col("nm").as("na"))
      .join(p.select(col("blk"), col("k").as("kb"), col("nm").as("nb")),
        Seq("blk"))
      .filter(col("ka") < col("kb"))
      .withColumn("jw_e6",
        floor(expr("jaro_winkler(na, nb)") * 1e6 + 0.5).cast("long"))
      .filter(col("jw_e6") >= 940000L)
      .select(col("blk"), col("ka"), col("kb"), col("jw_e6"))
  }

  /** Landed (blk, ka, kb, jw_e6) pairs at the 0.94 match threshold. */
  private def jwBlockMatches(s: org.apache.spark.sql.SparkSession, d: String,
                             probe: Boolean) =
    if (probe)
      graft.core.Landed.probeOrBuild(s, s"jw-matches:$d")(
        jwBlockMatchesBuild(s, d))
    else
      graft.core.Landed.land(s, s"jw-matches:$d")(jwBlockMatchesBuild(s, d))

  val q214 = GQuery(
    "q214_fuzzy_linkage",
    (s, d) => {
      val p = linkageParts(s, d)
      val sizes = p.groupBy(col("blk")).agg(lcount(lit(1)).as("c"))
        .filter(col("c") > 1)
        .select(col("blk"),
          // c(c-1) is even, so the double division is exact; cast keeps
          // the column BIGINT like the oracle's integer //
          (col("c") * (col("c") - 1) / 2).cast("long").as("n_candidates"))
      val matches = jwBlockMatches(s, d, probe = false)
        .groupBy(col("blk"))
        .agg(lcount(lit(1)).as("n_matches"),
          sum(col("jw_e6")).as("jw_checksum"),
          max(col("jw_e6")).as("max_jw_e6"))
      sizes.join(matches, Seq("blk"), "left")
        .select(col("blk"), col("n_candidates"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          coalesce(col("jw_checksum"), lit(0L)).as("jw_checksum"),
          coalesce(col("max_jw_e6"), lit(0L)).as("max_jw_e6"))
    },
    Some("""WITH p AS (
      |  SELECT p_partkey AS k, p_name || ' ' || lower(p_type) AS nm,
      |    substr(p_name, 1, 6) || CAST(length(p_name) AS VARCHAR) AS blk
      |  FROM part),
      |sizes AS (
      |  SELECT blk, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY blk
      |  HAVING COUNT(*) > 1),
      |m AS (
      |  SELECT a.blk,
      |    CAST(FLOOR(jaro_winkler_similarity(a.nm, b.nm) * 1e6 + 0.5) AS BIGINT)
      |      AS jw_e6
      |  FROM p a JOIN p b ON a.blk = b.blk AND a.k < b.k),
      |mm AS (
      |  SELECT blk, CAST(COUNT(*) AS BIGINT) AS n_matches,
      |    CAST(SUM(jw_e6) AS BIGINT) AS jw_checksum,
      |    MAX(jw_e6) AS max_jw_e6
      |  FROM m WHERE jw_e6 >= 940000 GROUP BY blk)
      |SELECT s.blk, CAST(s.c * (s.c - 1) // 2 AS BIGINT) AS n_candidates,
      |  COALESCE(mm.n_matches, 0) AS n_matches,
      |  COALESCE(mm.jw_checksum, 0) AS jw_checksum,
      |  COALESCE(mm.max_jw_e6, 0) AS max_jw_e6
      |FROM sizes s LEFT JOIN mm ON s.blk = mm.blk""".stripMargin))

  /** q233: tool-call trace balance QA — agentic training data arrives
    * as per-session event sequences where every tool RESULT must close
    * an open CALL (a stack discipline); traces violating it poison
    * tool-use fine-tuning. Per user, in (ts, event_id) order, the
    * running call-depth cumsum classifies each trace: `orphan_result`
    * when depth ever dips below zero, `dangling_call` when it ends
    * positive, else `balanced`. One per-session window (sessions are
    * bounded) + one census aggregation — no driver state, replays in
    * ANSI window SQL. Op kinds derive deterministically from event_id
    * so both engines build the identical fixture. */
  val q233 = GQuery(
    "q233_trace_balance",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val delta = when(col("event_id") % 10 <= 2, lit(1L))
        .when(col("event_id") % 10 <= 5, lit(-1L))
        .otherwise(lit(0L))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), delta.as("__d"))
        .withColumn("__depth", sum(col("__d")).over(w))
        .groupBy(col("user_id"))
        .agg(
          lcount(lit(1)).as("n_events"),
          sum(when(col("__d") === 1, lit(1L)).otherwise(lit(0L))).as("n_calls"),
          sum(when(col("__d") === -1, lit(1L)).otherwise(lit(0L))).as("n_results"),
          min(col("__depth")).as("min_depth"),
          sum(col("__d")).as("final_depth"))
        .withColumn("verdict",
          when(col("min_depth") < 0, lit("orphan_result"))
            .when(col("final_depth") > 0, lit("dangling_call"))
            .otherwise(lit("balanced")))
    },
    Some("""WITH ops AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN event_id % 10 <= 2 THEN 1
      |         WHEN event_id % 10 <= 5 THEN -1 ELSE 0 END AS d
      |  FROM events),
      |dep AS (
      |  SELECT user_id, d,
      |    SUM(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth
      |  FROM ops),
      |cen AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_calls,
      |    CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_results,
      |    CAST(MIN(depth) AS BIGINT) AS min_depth,
      |    CAST(SUM(d) AS BIGINT) AS final_depth
      |  FROM dep GROUP BY user_id)
      |SELECT user_id, n_events, n_calls, n_results, min_depth, final_depth,
      |  CASE WHEN min_depth < 0 THEN 'orphan_result'
      |       WHEN final_depth > 0 THEN 'dangling_call'
      |       ELSE 'balanced' END AS verdict
      |FROM cen""".stripMargin))

  /** q234: JSON schema census ([[graft.operators.JsonCensus]]) — the
    * schema-drift monitor for semi-structured payload columns: which
    * keys occur, how often, with which value types, censused FROM the
    * data. The fixture plants real drift (key `a` arrives as int,
    * double, and explicit null across variants). Engines classify
    * through different parse surfaces (Spark's map<string,string>
    * raw-value capture vs DuckDB json_extract's quoted/`null` texts)
    * but the type SEMANTICS align, so the census hashes equal. */
  val q234 = GQuery(
    "q234_json_schema_census",
    (s, d) => {
      val id = col("event_id")
      val j = when(id % 4 === 0,
          concat(lit("{\"a\":"), id.cast("string"),
            lit(",\"b\":\"s"), (id % 7).cast("string"), lit("\"}")))
        .when(id % 4 === 1,
          concat(lit("{\"a\":"), id.cast("string"), lit(".5,\"c\":true}")))
        .when(id % 4 === 2,
          concat(lit("{\"b\":\"t\",\"d\":[1,"), (id % 3).cast("string"),
            lit("]}")))
        .otherwise(lit("{\"a\":null,\"c\":false}"))
      graft.operators.JsonCensus.keyCensus(
        events(s, d).select(j.as("props_json")), "props_json")
    },
    Some("""WITH j AS (
      |  SELECT CASE
      |    WHEN event_id % 4 = 0 THEN
      |      '{"a":' || CAST(event_id AS VARCHAR) || ',"b":"s'
      |        || CAST(event_id % 7 AS VARCHAR) || '"}'
      |    WHEN event_id % 4 = 1 THEN
      |      '{"a":' || CAST(event_id AS VARCHAR) || '.5,"c":true}'
      |    WHEN event_id % 4 = 2 THEN
      |      '{"b":"t","d":[1,' || CAST(event_id % 3 AS VARCHAR) || ']}'
      |    ELSE '{"a":null,"c":false}' END AS pj
      |  FROM events),
      |kv AS (
      |  -- a JSON null extracts as SQL NULL here (Spark's map value is
      |  -- NULL too); coalesce to the literal so one branch counts both
      |  SELECT u.key,
      |    COALESCE(CAST(json_extract(j.pj, '$.' || u.key) AS VARCHAR),
      |      'null') AS vt
      |  FROM j, UNNEST(json_keys(j.pj)) AS u(key))
      |SELECT key, CAST(COUNT(*) AS BIGINT) AS n_present,
      |  CAST(SUM(CASE WHEN vt = 'null' THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  CAST(SUM(CASE WHEN regexp_matches(vt, '^-?[0-9]+$') THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_int,
      |  CAST(SUM(CASE WHEN regexp_matches(vt, '^-?[0-9]+\.[0-9]+$') THEN 1
      |    ELSE 0 END) AS BIGINT) AS n_double,
      |  CAST(SUM(CASE WHEN vt IN ('true', 'false') THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_bool,
      |  CAST(SUM(CASE WHEN vt LIKE '[%' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_array,
      |  CAST(SUM(CASE WHEN vt LIKE '"%' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_string
      |FROM kv GROUP BY key""".stripMargin))

  /** q238: VAD segment manifests — the audio-preprocessing face beside
    * q155's frame sampling: a voice-activity pass over per-window
    * energies yields the speech segments an ASR-data pipeline clips
    * and transcribes. The decode stub is honest (md5-uniform window
    * energies — the audio libs aren't here); the part that must be
    * right at scale IS exercised: windows explode boundedly per doc,
    * activity thresholds map-only, maximal active runs come from the
    * i − row_number gaps-and-islands key on PER-DOC windows (never a
    * global window), and the manifest is one census per doc. */
  val q238 = GQuery(
    "q238_vad_segments",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val nWin = (lit(8) + col("n_chars") % 40).cast("int")
      val u = (conv(substring(md5(concat(lit("vad-"),
        col("doc_id").cast("string"), lit("-"), col("i").cast("string"))),
        1, 7), 16, 10).cast("long") + lit(0L)).cast("double") / lit(268435456.0)
      val win = documents(s, d)
        .select(col("doc_id"), explode(sequence(lit(0), nWin - 1)).as("i"))
        .withColumn("__active", u > 0.55)
      val segs = win.filter(col("__active"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("i"))))
        .groupBy(col("doc_id"), (col("i") - col("__rn")).as("__seg"))
        .agg(count(lit(1)).as("__len"))
        .groupBy(col("doc_id"))
        .agg(lcount(lit(1)).as("n_segments"),
          sum(col("__len")).as("n_active"),
          max(col("__len")).as("longest_seg"))
      win.groupBy(col("doc_id")).agg(lcount(lit(1)).as("n_windows"))
        .join(segs, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_windows"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("n_active"), lit(0L)).as("n_active"),
          coalesce(col("longest_seg"), lit(0L)).as("longest_seg"),
          floor(coalesce(col("n_active"), lit(0L)).cast("double") /
            col("n_windows").cast("double") * 1e6 + 0.5).cast("long")
            .as("speech_ratio_e6"))
    },
    Some("""WITH win AS (
      |  SELECT doc_id, u.i,
      |    CAST(('0x' || substr(md5('vad-' || CAST(doc_id AS VARCHAR) || '-'
      |      || CAST(u.i AS VARCHAR)), 1, 7)) AS BIGINT) / 268435456.0 > 0.55
      |      AS active
      |  FROM documents,
      |    UNNEST(generate_series(0, CAST(8 + n_chars % 40 AS BIGINT) - 1))
      |      AS u(i)),
      |act AS (
      |  SELECT doc_id, i,
      |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS seg
      |  FROM win WHERE active),
      |sl AS (
      |  SELECT doc_id, seg, CAST(COUNT(*) AS BIGINT) AS len
      |  FROM act GROUP BY 1, 2),
      |segs AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
      |    CAST(SUM(len) AS BIGINT) AS n_active,
      |    CAST(MAX(len) AS BIGINT) AS longest_seg
      |  FROM sl GROUP BY doc_id),
      |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows
      |        FROM win GROUP BY doc_id)
      |SELECT t.doc_id, t.n_windows,
      |  COALESCE(s.n_segments, 0) AS n_segments,
      |  COALESCE(s.n_active, 0) AS n_active,
      |  COALESCE(s.longest_seg, 0) AS longest_seg,
      |  CAST(floor(CAST(COALESCE(s.n_active, 0) AS DOUBLE)
      |    / CAST(t.n_windows AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
      |    AS speech_ratio_e6
      |FROM tot t LEFT JOIN segs s ON t.doc_id = s.doc_id""".stripMargin))

  /** q254: entity resolution — the composition q214's pairwise scores
    * exist FOR (the master-data shape: fuzzy match → transitive
    * closure → golden record): blocked Jaro–Winkler matches become
    * edges, [[graft.dedup.Components.connected]] (large-star/
    * small-star, O(log n) rounds) groups transitively-linked records
    * into entities, and each entity elects its canonical member
    * (min key) with a membership and score census. Never all-pairs:
    * candidate pairs come from the same equality blocks as q214, the
    * closure is edge-local. The oracle replays scoring (DuckDB's
    * jaro_winkler_similarity is bit-equal, the q214 result), the
    * closure (reach + MIN label, the q57 spelling), and the election. */
  val q254 = GQuery(
    "q254_entity_resolution",
    (s, d) => {
      val p = linkageParts(s, d)
      val matches = jwBlockMatches(s, d, probe = true)
      val comp = graft.dedup.Components.connected(matches, "ka", "kb")
      val census = matches
        .join(comp.select(col("node").as("ka"), col("component")), Seq("ka"))
        .groupBy(col("component"))
        .agg(lcount(lit(1)).as("n_edges"), sum(col("jw_e6")).as("jw_sum"))
      comp.groupBy(col("component"))
        .agg(lcount(lit(1)).as("n_members"))
        .join(census, Seq("component"))
        .join(p.select(col("k").as("component"), md5(col("nm")).as("canonical_md5")),
          Seq("component"))
        .select(col("component").as("entity_id"), col("n_members"),
          col("n_edges"), col("jw_sum"), col("canonical_md5"))
    },
    Some("""WITH RECURSIVE p AS (
      |  SELECT p_partkey AS k, p_name || ' ' || lower(p_type) AS nm,
      |    substr(p_name, 1, 6) || CAST(length(p_name) AS VARCHAR) AS blk
      |  FROM part),
      |m AS (
      |  SELECT a.k AS ka, b.k AS kb,
      |    CAST(FLOOR(jaro_winkler_similarity(a.nm, b.nm) * 1e6 + 0.5) AS BIGINT)
      |      AS jw_e6
      |  FROM p a JOIN p b ON a.blk = b.blk AND a.k < b.k),
      |jm AS (SELECT ka, kb, jw_e6 FROM m WHERE jw_e6 >= 940000),
      |edges AS (
      |  SELECT ka AS u, kb AS v FROM jm
      |  UNION SELECT kb AS u, ka AS v FROM jm),
      |nodes AS (SELECT DISTINCT u AS n FROM edges),
      |reach(n, l) AS (
      |  SELECT n, n FROM nodes
      |  UNION
      |  SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n),
      |comp AS (SELECT n AS node, MIN(l) AS component FROM reach GROUP BY n),
      |members AS (
      |  SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
      |  FROM comp GROUP BY component),
      |census AS (
      |  SELECT c.component, CAST(COUNT(*) AS BIGINT) AS n_edges,
      |    CAST(SUM(j.jw_e6) AS BIGINT) AS jw_sum
      |  FROM jm j JOIN comp c ON j.ka = c.node
      |  GROUP BY c.component)
      |SELECT mb.component AS entity_id, mb.n_members, cs.n_edges, cs.jw_sum,
      |  md5(p.nm) AS canonical_md5
      |FROM members mb
      |JOIN census cs ON mb.component = cs.component
      |JOIN p ON p.k = mb.component""".stripMargin))

  /** q256: sorted-neighborhood blocking ([[graft.dedup.Blocking]],
    * Hernández–Stolfo SIGMOD'95) as the second blocking pass beside
    * q214's equality blocks — the multi-pass linkage census: per
    * window offset j, candidate and match counts plus how many
    * matches the sorted window finds that the equality blocks MISS
    * (prefix-damaged keys sort adjacent but hash apart — the reason
    * production linkage unions blocking passes). Window candidates
    * are exactly w·n — linear at any corpus size, no hot-block
    * depth skew by construction. The oracle replays the global sort
    * position, the offset joins, the bit-equal Jaro–Winkler scores,
    * and the anti-join against the equality-block matches. */
  val q256 = GQuery(
    "q256_sorted_neighborhood",
    (s, d) => {
      graft.functions.JaroWinkler.register(s)
      val p = linkageParts(s, d)
        .localCheckpoint(eager = false) // sort pass + two score joins
      val sn = graft.dedup.Blocking
        .sortedNeighborhoodPairs(p, "k", "nm", w = 3)
      val scored = sn
        .join(p.select(col("k").as("ka"), col("nm").as("na")), Seq("ka"))
        .join(p.select(col("k").as("kb"), col("nm").as("nb")), Seq("kb"))
        .withColumn("jw_e6",
          floor(expr("jaro_winkler(na, nb)") * 1e6 + 0.5).cast("long"))
        .localCheckpoint(eager = false) // census + the anti-join arm
      val eqm = jwBlockMatches(s, d, probe = true)
        .select(least(col("ka"), col("kb")).as("lo"),
          greatest(col("ka"), col("kb")).as("hi"))
      val newOnly = scored.filter(col("jw_e6") >= 940000L)
        .select(col("j"), least(col("ka"), col("kb")).as("lo"),
          greatest(col("ka"), col("kb")).as("hi"))
        .join(eqm, Seq("lo", "hi"), "left_anti")
        .groupBy(col("j")).agg(lcount(lit(1)).as("n_new_vs_blocking"))
      scored.groupBy(col("j"))
        .agg(lcount(lit(1)).as("n_pairs"),
          sum(when(col("jw_e6") >= 940000L, lit(1L)).otherwise(lit(0L)))
            .as("n_matches"),
          sum(when(col("jw_e6") >= 940000L, col("jw_e6")).otherwise(lit(0L)))
            .as("jw_checksum"))
        .join(newOnly, Seq("j"), "left")
        .select(col("j"), col("n_pairs"), col("n_matches"),
          col("jw_checksum"),
          coalesce(col("n_new_vs_blocking"), lit(0L)).as("n_new_vs_blocking"))
    },
    Some("""WITH p AS (
      |  SELECT p_partkey AS k, p_name || ' ' || lower(p_type) AS nm,
      |    substr(p_name, 1, 6) || CAST(length(p_name) AS VARCHAR) AS blk
      |  FROM part),
      |ord AS (
      |  SELECT k, nm, row_number() OVER (ORDER BY nm, k) - 1 AS idx
      |  FROM p),
      |sn AS (
      |  SELECT a.k AS ka, b.k AS kb, s.j,
      |    CAST(FLOOR(jaro_winkler_similarity(a.nm, b.nm) * 1e6 + 0.5)
      |      AS BIGINT) AS jw_e6
      |  FROM ord a, UNNEST(generate_series(1, 3)) AS s(j)
      |  JOIN ord b ON b.idx = a.idx + s.j),
      |eqm AS (
      |  SELECT LEAST(a.k, b.k) AS lo, GREATEST(a.k, b.k) AS hi
      |  FROM p a JOIN p b ON a.blk = b.blk AND a.k < b.k
      |  WHERE CAST(FLOOR(jaro_winkler_similarity(a.nm, b.nm) * 1e6 + 0.5)
      |    AS BIGINT) >= 940000),
      |newo AS (
      |  SELECT s.j, CAST(COUNT(*) AS BIGINT) AS n_new_vs_blocking
      |  FROM sn s
      |  WHERE s.jw_e6 >= 940000 AND NOT EXISTS (
      |    SELECT 1 FROM eqm e
      |    WHERE e.lo = LEAST(s.ka, s.kb) AND e.hi = GREATEST(s.ka, s.kb))
      |  GROUP BY s.j)
      |SELECT c.j, c.n_pairs, c.n_matches, c.jw_checksum,
      |  COALESCE(n.n_new_vs_blocking, 0) AS n_new_vs_blocking
      |FROM (
      |  SELECT j, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    CAST(SUM(CASE WHEN jw_e6 >= 940000 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_matches,
      |    CAST(SUM(CASE WHEN jw_e6 >= 940000 THEN jw_e6 ELSE 0 END)
      |      AS BIGINT) AS jw_checksum
      |  FROM sn GROUP BY j) c
      |LEFT JOIN newo n ON c.j = n.j""".stripMargin))

  /** q370: Fellegi–Sunter (1969) m/u match-weight estimation — the
    * probabilistic SCORING half of the record-linkage family (q214
    * lands the JW comparison step, q254/q256 consume it for
    * clustering/blocking; this query turns it into calibrated field
    * weights): over all in-block candidate pairs, three field
    * comparisons (brand equality, size equality, |Δretail| ≤ 1), with
    * the landed q214 JW-match table as the M-set label; m = P(agree|M),
    * u = P(agree|U) with a 0.5 Laplace guard, and the published
    * weights are the log₂ likelihood ratios ln(m/u), ln((1−m)/(1−u))
    * every F-S decision rule thresholds on. Candidate generation is
    * the same bounded block equi-join (never all-pairs); the landed
    * probe costs a pinned-block scan, not a JW re-score. */
  val q370 = GQuery(
    "q370_fellegi_sunter",
    (s, d) => {
      val p = part(s, d).select(col("p_partkey").as("k"),
        col("p_brand").as("br"), col("p_size").as("sz"),
        col("p_retailprice").as("rp"),
        concat(substring(col("p_name"), 1, 6),
          length(col("p_name")).cast("string")).as("blk"))
      val cand = p.select(col("blk"), col("k").as("ka"), col("br").as("bra"),
          col("sz").as("sza"), col("rp").as("rpa"))
        .join(p.select(col("blk"), col("k").as("kb"), col("br").as("brb"),
          col("sz").as("szb"), col("rp").as("rpb")), Seq("blk"))
        .filter(col("ka") < col("kb"))
      val labeled = cand.join(
          jwBlockMatches(s, d, probe = true)
            .select(col("ka"), col("kb"), lit(true).as("m")),
          Seq("ka", "kb"), "left")
        .select((col("bra") === col("brb")).as("a1"),
          (col("sza") === col("szb")).as("a2"),
          (abs(col("rpa") - col("rpb")) <= 1.0).as("a3"),
          coalesce(col("m"), lit(false)).as("m"))
      // ONE pass over the candidate pairs computes every field's
      // agreement tallies; the 1-row result unpivots to the 3-field
      // frame (the q365 histogram-trick discipline: candidate work
      // never repeats per field)
      def agrees(a: String, neg: Boolean) = coalesce(
        sum(when((if (neg) !col("m") else col("m")) && col(a), 1L)),
        lit(0L))
      labeled.agg(
          coalesce(sum(when(col("m"), 1L)), lit(0L)).as("n_m"),
          coalesce(sum(when(!col("m"), 1L)), lit(0L)).as("n_u"),
          agrees("a1", neg = false).as("am1"), agrees("a1", neg = true).as("au1"),
          agrees("a2", neg = false).as("am2"), agrees("a2", neg = true).as("au2"),
          agrees("a3", neg = false).as("am3"), agrees("a3", neg = true).as("au3"))
        .selectExpr("n_m", "n_u",
          """stack(3, 'brand_eq', am1, au1, 'size_eq', am2, au2,
            | 'retail_near', am3, au3) AS (field, agree_m, agree_u)"""
            .stripMargin.replace("\n", ""))
        .withColumn("mm", (col("agree_m").cast("double") + 0.5)
          / (col("n_m").cast("double") + 1.0))
        .withColumn("uu", (col("agree_u").cast("double") + 0.5)
          / (col("n_u").cast("double") + 1.0))
        .select(col("field"), col("n_m"), col("n_u"), col("agree_m"),
          col("agree_u"),
          round(col("mm"), 6).as("m_prob"),
          round(col("uu"), 6).as("u_prob"),
          round(log(col("mm") / col("uu")), 6).as("w_agree"),
          round(log((lit(1.0) - col("mm")) / (lit(1.0) - col("uu"))), 6)
            .as("w_disagree"))
        .orderBy(col("field"))
    },
    Some("""WITH p AS (
      |  SELECT p_partkey AS k, p_brand AS br, p_size AS sz,
      |    p_retailprice AS rp,
      |    substr(p_name, 1, 6) || CAST(length(p_name) AS VARCHAR) AS blk,
      |    p_name || ' ' || lower(p_type) AS nm
      |  FROM part),
      |mset AS (
      |  SELECT a.k AS ka, b.k AS kb
      |  FROM p a JOIN p b ON a.blk = b.blk AND a.k < b.k
      |  WHERE CAST(FLOOR(jaro_winkler_similarity(a.nm, b.nm) * 1e6 + 0.5)
      |    AS BIGINT) >= 940000),
      |lab AS (
      |  SELECT (a.br = b.br) AS a1, (a.sz = b.sz) AS a2,
      |    (abs(a.rp - b.rp) <= 1.0) AS a3,
      |    (ms.ka IS NOT NULL) AS m
      |  FROM p a JOIN p b ON a.blk = b.blk AND a.k < b.k
      |  LEFT JOIN mset ms ON ms.ka = a.k AND ms.kb = b.k),
      |f AS (
      |  SELECT 'brand_eq' AS field,
      |    COALESCE(CAST(SUM(CASE WHEN m THEN 1 END) AS BIGINT), 0) AS n_m,
      |    COALESCE(CAST(SUM(CASE WHEN NOT m THEN 1 END) AS BIGINT), 0) AS n_u,
      |    COALESCE(CAST(SUM(CASE WHEN m AND a1 THEN 1 END) AS BIGINT), 0)
      |      AS agree_m,
      |    COALESCE(CAST(SUM(CASE WHEN NOT m AND a1 THEN 1 END) AS BIGINT), 0)
      |      AS agree_u
      |  FROM lab
      |  UNION ALL
      |  SELECT 'size_eq',
      |    COALESCE(CAST(SUM(CASE WHEN m THEN 1 END) AS BIGINT), 0),
      |    COALESCE(CAST(SUM(CASE WHEN NOT m THEN 1 END) AS BIGINT), 0),
      |    COALESCE(CAST(SUM(CASE WHEN m AND a2 THEN 1 END) AS BIGINT), 0),
      |    COALESCE(CAST(SUM(CASE WHEN NOT m AND a2 THEN 1 END) AS BIGINT), 0)
      |  FROM lab
      |  UNION ALL
      |  SELECT 'retail_near',
      |    COALESCE(CAST(SUM(CASE WHEN m THEN 1 END) AS BIGINT), 0),
      |    COALESCE(CAST(SUM(CASE WHEN NOT m THEN 1 END) AS BIGINT), 0),
      |    COALESCE(CAST(SUM(CASE WHEN m AND a3 THEN 1 END) AS BIGINT), 0),
      |    COALESCE(CAST(SUM(CASE WHEN NOT m AND a3 THEN 1 END) AS BIGINT), 0)
      |  FROM lab),
      |w AS (
      |  SELECT *, (CAST(agree_m AS DOUBLE) + 0.5)
      |      / (CAST(n_m AS DOUBLE) + 1.0) AS mm,
      |    (CAST(agree_u AS DOUBLE) + 0.5)
      |      / (CAST(n_u AS DOUBLE) + 1.0) AS uu
      |  FROM f)
      |SELECT field, n_m, n_u, agree_m, agree_u,
      |  round(mm, 6) AS m_prob, round(uu, 6) AS u_prob,
      |  round(ln(mm / uu), 6) AS w_agree,
      |  round(ln((1.0 - mm) / (1.0 - uu)), 6) AS w_disagree
      |FROM w ORDER BY field""".stripMargin))

  /** q405: learned-index CDF fit census (Kraska et al. 2018) — the
    * systems-side "can a linear model replace the B-tree level"
    * check: keys range-shard into 8 segments (a scalar max broadcast
    * — order-preserving, so per-shard ranks parallelize; never one
    * global sort), each shard fits rank ≈ a + b·key by exact
    * decimal-moment OLS, and the census reports the max |rank error|
    * — the binary-search window a learned index must pay per lookup.
    * Key moments route through DECIMAL(38,0) (key² sums pass int64
    * early). */
  val q405 = GQuery(
    "q405_learned_index",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
      val keys = orders(s, d).select(col("o_orderkey").as("k"))
      val mx = keys.agg(max(col("k")).as("mk"))
      val ranked = keys.crossJoin(broadcast(mx))
        .withColumn("shard",
          least(floor(col("k").cast("double") / (col("mk").cast("double") / 8)),
            lit(7.0)).cast("long"))
        .withColumn("r", row_number().over(
          W.partitionBy(col("shard")).orderBy(col("k"))).cast("long"))
      val fit = ranked.groupBy(col("shard"))
        .agg(lcount(lit(1)).as("n"),
          sum(col("k").cast(dec0)).as("sk"),
          sum(col("k").cast(dec0) * col("k")).as("skk"),
          sum(col("r").cast(dec0)).as("sr"),
          sum(col("r").cast(dec0) * col("k")).as("srk"))
        .withColumn("b",
          (col("n").cast("double") * col("srk").cast("double")
            - col("sk").cast("double") * col("sr").cast("double"))
            / (col("n").cast("double") * col("skk").cast("double")
              - col("sk").cast("double") * col("sk").cast("double")))
        .withColumn("a",
          (col("sr").cast("double") - col("b") * col("sk").cast("double"))
            / col("n").cast("double"))
      ranked.join(broadcast(fit.select(col("shard"), col("n"), col("a"),
          col("b"))), Seq("shard"))
        .withColumn("err",
          col("r").cast("double") - (col("a") + col("b") * col("k")))
        .groupBy(col("shard"), col("n"), col("a"), col("b"))
        .agg(max(abs(col("err"))).as("max_err"))
        .select(col("shard"), col("n"),
          round(col("b"), 9).as("slope"),
          round(col("a"), 6).as("intercept"),
          round(col("max_err"), 3).as("max_abs_err"))
        .orderBy(col("shard"))
    },
    Some("""WITH keys AS (SELECT o_orderkey AS k FROM orders),
      |mx AS (SELECT MAX(k) AS mk FROM keys),
      |ranked AS (
      |  SELECT k,
      |    CAST(LEAST(floor(CAST(k AS DOUBLE) / (CAST(mk AS DOUBLE) / 8)),
      |      7.0) AS BIGINT) AS shard
      |  FROM keys CROSS JOIN mx),
      |rr AS (
      |  SELECT k, shard, CAST(row_number() OVER (PARTITION BY shard
      |    ORDER BY k) AS BIGINT) AS r
      |  FROM ranked),
      |fit AS (
      |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(k AS HUGEINT)) AS sk, SUM(CAST(k AS HUGEINT) * k) AS skk,
      |    SUM(CAST(r AS HUGEINT)) AS sr, SUM(CAST(r AS HUGEINT) * k) AS srk
      |  FROM rr GROUP BY shard),
      |ab AS (
      |  SELECT shard, n,
      |    (CAST(n AS DOUBLE) * CAST(srk AS DOUBLE)
      |      - CAST(sk AS DOUBLE) * CAST(sr AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(skk AS DOUBLE)
      |        - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)) AS b,
      |    CAST(sk AS DOUBLE) AS skd, CAST(sr AS DOUBLE) AS srd
      |  FROM fit),
      |ab2 AS (
      |  SELECT shard, n, b, (srd - b * skd) / CAST(n AS DOUBLE) AS a
      |  FROM ab)
      |SELECT f.shard, f.n, round(f.b, 9) AS slope,
      |  round(f.a, 6) AS intercept,
      |  round(MAX(abs(CAST(r.r AS DOUBLE) - (f.a + f.b * r.k))), 3)
      |    AS max_abs_err
      |FROM rr r JOIN ab2 f ON r.shard = f.shard
      |GROUP BY f.shard, f.n, f.a, f.b
      |ORDER BY f.shard""".stripMargin))

  def queries: Seq[GQuery] =
    Seq(q45, q46, q47, q49, q52, q59, q62, q63, q64, q67, q69, q71, q148, q155,
      q170, q177, q187, q192, q198, q199, q214, q233, q234, q238, q254, q256,
      q370, q405)
}
