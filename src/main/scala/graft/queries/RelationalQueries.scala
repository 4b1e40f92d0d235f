package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.operators.{Harmonize, UniqueKeyFullJoin}

/** Core relational surface: scans, filters/projections (SURVEY §2.2),
  * joins J1–J14 (§2.3) and the flat aggregations A1–A6 (§2.4), mapped
  * onto the driver's synthetic star schema.
  *
  * Every query pairs the Spark plan with a DuckDB-equivalent ANSI
  * oracle. Double sums go through [[graft.core.Exact]] so results are
  * bit-stable under any degree of parallelism.
  */
object RelationalQueries {

  /** A2/A3/A6-style grouped rollup with filter pushdown (the reference's
    * per-landing catch totals, `R/format-public-data.R:376-384`). */
  val q01 = GQuery(
    "q01_pricing_summary",
    (s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // scaled-long exact path: price ~1e5 → |Σ scaled| ≲ 1e17 even
          // at 100× this row count, well inside the int64 guard
          lsum6(col("l_quantity")).as("sum_qty"),
          lsum6(col("l_extendedprice")).as("sum_base_price"),
          lsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          lavg6(col("l_quantity")).as("avg_qty"),
          lcount(lit(1)).as("count_order"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      |${sqlLsum6("l_quantity")} AS sum_qty,
      |${sqlLsum6("l_extendedprice")} AS sum_base_price,
      |${sqlLsum6("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
      |${sqlLavg6("l_quantity")} AS avg_qty,
      |COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin),
    headline = true)

  /** §2.2 filter/project: IN-list, comparison, regex (`rlike`) predicates
    * pushed into the parquet scan (`R/validation-functions.R:425` et al.). */
  val q02 = GQuery(
    "q02_filter_project",
    (s, d) =>
      orders(s, d)
        .filter(col("o_orderstatus").isin("O", "F") &&
          col("o_totalprice") > 1000.0 &&
          col("o_orderpriority").rlike("^[1-3]-"))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"),
    Some("""SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
      |FROM orders
      |WHERE o_orderstatus IN ('O','F') AND o_totalprice > 1000.0
      |  AND regexp_matches(o_orderpriority, '^[1-3]-')""".stripMargin))

  /** §2.2 keyed distinct (`dropDuplicates`, `R/calculate-weights.R:478,502`). */
  val q03 = GQuery(
    "q03_distinct_keyed",
    (s, d) => customer(s, d).select("c_nationkey", "c_mktsegment").distinct(),
    Some("SELECT DISTINCT c_nationkey, c_mktsegment FROM customer"))

  /** J2–J4: broadcast dimension join (metadata/catch-code joins,
    * `R/validation-functions.R:516,539,571`). `part` is the broadcast-
    * sized dim; at 100 TB the fact side never shuffles for this join. */
  val q04 = GQuery(
    "q04_broadcast_dim_join",
    (s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          lsum6(col("l_extendedprice")).as("revenue"),
          lsum6(col("l_quantity")).as("qty"),
          lcount(lit(1)).as("n_items")),
    Some(s"""SELECT p_brand, ${sqlLsum6("l_extendedprice")} AS revenue,
      |${sqlLsum6("l_quantity")} AS qty, COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin),
    headline = true)

  /** J10-style multi-way equi-join fold: region→nation→customer→orders→
    * lineitem revenue rollup (the validate-landings 14-table left-join
    * fold, `R/validate-landings.R:136-154`). Small dims broadcast; the
    * orders↔lineitem join shuffles on the shared key once. */
  val q05 = GQuery(
    "q05_multiway_join",
    (s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          lsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          lcount(lit(1)).as("n_items")),
    Some(s"""SELECT r_name,
      |${sqlLsum6("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      |COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin),
    headline = true)

  /** J9/J14 left join + coalesce of the nullable side
    * (`R/validation-functions.R:503-505`). */
  val q06 = GQuery(
    "q06_left_join_coalesce",
    (s, d) =>
      orders(s, d)
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
        .agg(
          lcount(lit(1)).as("n_orders"),
          lsum6(col("o_totalprice")).as("total")),
    Some(s"""SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
      |COUNT(*) AS n_orders, ${sqlLsum6("o_totalprice")} AS total
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin))

  /** J12 semi-join (`%in%` filters, `R/merge-trips.R:119-121`). */
  val q07 = GQuery(
    "q07_semi_join",
    (s, d) =>
      customer(s, d)
        .join(
          orders(s, d).filter(col("o_orderstatus") === "O").select("o_custkey"),
          col("c_custkey") === col("o_custkey"),
          "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment"),
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin))

  /** J13 anti-join (not-yet-processed filters, `R/ingest-pds-data.R:181`). */
  val q08 = GQuery(
    "q08_anti_join",
    (s, d) =>
      part(s, d)
        .join(
          lineitem(s, d).filter(col("l_quantity") >= 46).select("l_partkey"),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name", "p_brand"),
    Some("""SELECT p_partkey, p_name, p_brand FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_partkey = p_partkey AND l_quantity >= 46)""".stripMargin))

  /** §1.3 + J14: schema-drift harmonization — two "survey versions" with
    * different column sets union by name with null fill, then roll up
    * (`R/merge-landings.R:102-163`). */
  val q09 = GQuery(
    "q09_union_harmonize",
    (s, d) => {
      val o = orders(s, d)
      val v1 = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      val v2 = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderstatus"))
      Harmonize.unionByNameAll(Seq(v1, v2))
        .agg(
          lcount(lit(1)).as("n"),
          lcount(col("o_totalprice")).as("n_price"),
          lcount(col("o_orderstatus")).as("n_status"),
          lsum6(col("o_totalprice")).as("total"))
    },
    Some(s"""WITH u AS (
      |  SELECT o_orderkey, o_totalprice, NULL AS o_orderstatus
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT o_orderkey, NULL AS o_totalprice, o_orderstatus
      |  FROM orders WHERE o_orderkey % 2 = 1)
      |SELECT COUNT(*) AS n, COUNT(o_totalprice) AS n_price,
      |COUNT(o_orderstatus) AS n_status, ${sqlLsum6("o_totalprice")} AS total
      |FROM u""".stripMargin))

  /** J8: the reference's central merge — full-outer join of rows unique
    * per (entity, day), non-unique rows appended unmatched
    * (`R/merge-trips.R:25-49`), here matching orders to events. */
  val q10 = GQuery(
    "q10_full_outer_unique",
    (s, d) => {
      val l = orders(s, d).select(
        col("o_custkey").as("entity_id"),
        date_trunc("day", col("o_orderdate")).as("day"),
        col("o_orderkey"), col("o_totalprice"))
      val r = events(s, d).select(
        col("user_id").as("entity_id"),
        date_trunc("day", col("ts")).as("day"),
        col("event_id"), col("value"))
      UniqueKeyFullJoin(l, r, Seq("entity_id", "day"))
        .groupBy(
          when(col("o_orderkey").isNotNull && col("event_id").isNotNull, "both")
            .when(col("o_orderkey").isNotNull, "left_only")
            .otherwise("right_only").as("match_type"))
        .agg(
          lcount(lit(1)).as("n"),
          lsum6(col("o_totalprice")).as("sum_price"),
          lsum6(col("value")).as("sum_value"))
    },
    Some(s"""WITH l AS (
      |  SELECT o_custkey AS entity_id, date_trunc('day', o_orderdate) AS day,
      |         o_orderkey, o_totalprice,
      |         COUNT(*) OVER (PARTITION BY o_custkey, date_trunc('day', o_orderdate)) AS cnt
      |  FROM orders),
      |r AS (
      |  SELECT user_id AS entity_id, date_trunc('day', ts) AS day,
      |         event_id, value,
      |         COUNT(*) OVER (PARTITION BY user_id, date_trunc('day', ts)) AS cnt
      |  FROM events),
      |j AS (
      |  SELECT lu.o_orderkey, lu.o_totalprice, ru.event_id, ru.value
      |  FROM (SELECT * FROM l WHERE cnt = 1) lu
      |  FULL JOIN (SELECT * FROM r WHERE cnt = 1) ru
      |    ON lu.entity_id = ru.entity_id AND lu.day = ru.day
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, NULL, NULL FROM l WHERE cnt > 1
      |  UNION ALL
      |  SELECT NULL, NULL, event_id, value FROM r WHERE cnt > 1)
      |SELECT CASE WHEN o_orderkey IS NOT NULL AND event_id IS NOT NULL THEN 'both'
      |            WHEN o_orderkey IS NOT NULL THEN 'left_only'
      |            ELSE 'right_only' END AS match_type,
      |COUNT(*) AS n, ${sqlLsum6("o_totalprice")} AS sum_price,
      |${sqlLsum6("value")} AS sum_value
      |FROM j GROUP BY 1""".stripMargin))

  /** Full schema-drift harmonization chain (J14 + §2.2 recode,
    * `R/clean-raw-data.R:45-176,237-253`): a second "survey version"
    * with renamed columns is mapped onto the canonical vocabulary
    * (renameAll), its drifted price column folded in (coalesceInto),
    * both versions unioned by name and the status codes recoded through
    * the dictionary when-chain with unmatched → null. */
  val q65 = GQuery(
    "q65_harmonize_recode",
    (s, d) => {
      val o = orders(s, d)
      val v1 = o.select(col("o_orderkey").as("key"),
        col("o_orderstatus").as("status_raw"), col("o_totalprice").as("price"))
        .withColumn("version", lit(1))
      val v2raw = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("id"), col("o_orderstatus").as("st"),
          col("o_totalprice").as("total"))
      val v2 = Harmonize.coalesceInto(
        Harmonize.renameAll(v2raw, Map("id" -> "key", "st" -> "status_raw",
          "total" -> "price2")),
        target = "price", sources = Seq("price", "price2"))
        .withColumn("version", lit(2))
      Harmonize.unionByNameAll(Seq(v1, v2))
        .withColumn("status", Harmonize.recode(col("status_raw"),
          Map("F" -> "finished", "O" -> "open", "P" -> "pending"),
          keepUnmatched = false))
        .groupBy(col("status"))
        .agg(lcount(lit(1)).as("n"),
          lsum6(col("price")).as("sum_price"),
          countDistinct(col("version")).as("n_versions"))
    },
    Some(s"""WITH u AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status_raw,
      |    o_totalprice AS price, 1 AS version
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, 2
      |  FROM orders WHERE o_orderkey % 3 = 0)
      |SELECT CASE status_raw WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
      |  WHEN 'P' THEN 'pending' END AS status,
      |COUNT(*) AS n, ${sqlLsum6("price")} AS sum_price,
      |COUNT(DISTINCT version) AS n_versions
      |FROM u GROUP BY 1""".stripMargin))

  /** q402: skyline / Pareto-frontier query (Börzsönyi et al. 2001) —
    * the classic "best price-performance" operator the relational
    * core was missing: parts minimizing retail price while maximizing
    * size, with STRICT dominance semantics (ties on both axes are
    * mutually non-dominating and all survive). The scalable plan is
    * the sort-based 2-D skyline: per-price max, one running-max
    * window over the price-ordered bounded frame, then a hash join
    * back — never the quadratic NOT-EXISTS; the ORACLE deliberately
    * uses the quadratic NOT-EXISTS dominance definition, so the two
    * independent formulations must agree row-for-row under the
    * hash. */
  val q402 = GQuery(
    "q402_skyline_pareto",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val pts = part(s, d).select(col("p_partkey").as("k"),
        col("p_retailprice").as("price"), col("p_size").as("size"))
      val perPrice = pts.groupBy(col("price"))
        .agg(max(col("size")).as("pmax"))
      val frontier = perPrice
        .withColumn("runmax", max(col("pmax")).over(
          W.orderBy(col("price"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .withColumn("priormax", lag(col("runmax"), 1).over(
          W.orderBy(col("price"))))
        .filter(col("priormax").isNull || col("pmax") > col("priormax"))
        .select(col("price"), col("pmax"))
      pts.join(broadcast(frontier), Seq("price"))
        .filter(col("size") === col("pmax"))
        .select(col("k").as("p_partkey"), col("price"),
          col("size").cast("long").as("size"))
        .orderBy(col("price"), col("p_partkey"))
    },
    Some("""WITH pts AS (
      |  SELECT p_partkey AS k, p_retailprice AS price, p_size AS size
      |  FROM part)
      |SELECT p.k AS p_partkey, p.price, CAST(p.size AS BIGINT) AS size
      |FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.price <= p.price AND q.size >= p.size
      |    AND (q.price < p.price OR q.size > p.size))
      |ORDER BY p.price, p.k""".stripMargin))

  def queries: Seq[GQuery] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q65, q402)
}
