package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.operators.{Complete, Nest}

/** Reshaping surface (SURVEY §2.4 A11–A18): pivot/unpivot, the
  * nest/unnest kernel (the reference's signature nested list-columns,
  * §1.1), spine completion, row replication, and proportion-of-total.
  */
object ReshapeQueries {

  /** A13 pivot_wider: orders per customer-nation pivoted by status
    * (`R/pt_nest_species.R:49`). Spark pivot leaves missing cells null —
    * filled to 0 to match COUNT semantics. */
  val q17 = GQuery(
    "q17_pivot_wider",
    (s, d) =>
      orders(s, d)
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("F", "O", "P")),
    Some("""SELECT c_nationkey,
      |COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey""".stripMargin))

  /** A12 pivot_longer: melt lineitem measures to (metric, value) rows
    * via `stack` (`R/pt_nest_species.R:43-47`), then per-metric rollup. */
  val q18 = GQuery(
    "q18_unpivot_melt",
    (s, d) =>
      lineitem(s, d)
        .select(expr(
          """stack(4,
            |'quantity', l_quantity,
            |'extendedprice', l_extendedprice,
            |'discount', l_discount,
            |'tax', l_tax) AS (metric, value)""".stripMargin))
        .groupBy(col("metric"))
        .agg(lsum6(col("value")).as("sum_value"), lcount(col("value")).as("n")),
    Some(s"""WITH m AS (
      |  SELECT 'quantity' AS metric, l_quantity AS value FROM lineitem
      |  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT 'discount', l_discount FROM lineitem
      |  UNION ALL SELECT 'tax', l_tax FROM lineitem)
      |SELECT metric, ${sqlLsum6("value")} AS sum_value, COUNT(value) AS n
      |FROM m GROUP BY metric""".stripMargin))

  /** A14/A15: the nest → unnest round trip. Lineitems are nested per
    * order into an ordered array-of-struct (`collect_list(struct)` +
    * `array_sort`, the reference's species_group list-column,
    * `R/pt_nest_species.R:82-91`), array-level fields are derived, then
    * the array is exploded back and re-aggregated. The oracle states the
    * equivalent flat semantics. */
  val q19 = GQuery(
    "q19_nest_unnest",
    (s, d) => {
      // l_linenumber is not unique per order in this data: the sort key
      // is the full payload tuple so the array order is deterministic.
      val nested = Nest.nest(
        lineitem(s, d),
        keys = Seq("l_orderkey"),
        payload = Seq("l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"),
        orderField = "l_linenumber",
        as = "items")
      val exploded = nested
        .withColumn("n_items", size(col("items")).cast("long"))
        .withColumn("first_part", col("items").getItem(0).getField("l_partkey"))
        .select(col("l_orderkey"), col("n_items"), col("first_part"),
          explode(col("items")).as("item"))
      exploded
        .groupBy(col("l_orderkey"), col("n_items"), col("first_part"))
        .agg(lsum6(col("item.l_quantity")).as("total_qty"))
    },
    Some(s"""WITH f AS (
      |  SELECT l_orderkey, l_partkey, l_quantity,
      |    row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice) AS rn
      |  FROM lineitem)
      |SELECT l_orderkey, COUNT(*) AS n_items,
      |MAX(CASE WHEN rn = 1 THEN l_partkey END) AS first_part,
      |${sqlLsum6("l_quantity")} AS total_qty
      |FROM f GROUP BY l_orderkey""".stripMargin),
    headline = true)

  /** A11 tidyr::complete + J7 spine right-join: month spine × status
    * grid from the data's own bounds, missing cells filled 0
    * (`R/estimate-catch.R:131-135,534-546`). */
  val q20 = GQuery(
    "q20_complete_spine",
    (s, d) => {
      val o = orders(s, d).withColumn("month", date_trunc("month", col("o_orderdate")))
      val monthly = o.groupBy(col("month"), col("o_orderstatus"))
        .agg(lcount(lit(1)).as("n"), lsum6(col("o_totalprice")).as("total"))
      // spine bounds and the status domain come from the ALREADY-AGGREGATED
      // frame (every month/status of o appears in monthly), so orders is
      // scanned once, not three times — r1→r2 regression chased in VERDICT §7
      val spine = monthly.agg(min(col("month")).as("lo"), max(col("month")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 month"))).as("month"))
      val statuses = monthly.select(col("o_orderstatus")).distinct()
      Complete.complete(monthly, spine.crossJoin(statuses), Seq("month", "o_orderstatus"))
        .na.fill(0, Seq("n"))
        .na.fill(0.0, Seq("total"))
    },
    Some(s"""WITH o AS (
      |  SELECT date_trunc('month', o_orderdate) AS month, o_orderstatus, o_totalprice
      |  FROM orders),
      |monthly AS (
      |  SELECT month, o_orderstatus, COUNT(*) AS n, ${sqlLsum6("o_totalprice")} AS total
      |  FROM o GROUP BY 1, 2),
      |spine AS (
      |  SELECT unnest(generate_series(
      |    (SELECT min(month) FROM o), (SELECT max(month) FROM o),
      |    INTERVAL 1 MONTH)) AS month),
      |grid AS (SELECT month, o_orderstatus
      |         FROM spine CROSS JOIN (SELECT DISTINCT o_orderstatus FROM o))
      |SELECT g.month, g.o_orderstatus,
      |COALESCE(m.n, 0) AS n, COALESCE(m.total, 0.0) AS total
      |FROM grid g LEFT JOIN monthly m
      |  ON g.month = m.month AND g.o_orderstatus = m.o_orderstatus""".stripMargin))

  /** A18 proportion-of-total via window sum (taxa % of catch,
    * `R/estimate-catch.R:593-603`): nation revenue share within region. */
  val q21 = GQuery(
    "q21_share_of_total",
    (s, d) => {
      val rev = lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast(Dec)).as("rev_dec"))
      val w = Window.partitionBy("r_name")
      rev
        .withColumn("revenue", col("rev_dec").cast("double"))
        .withColumn("share", col("rev_dec").cast("double") / sum(col("rev_dec")).over(w).cast("double"))
        .select("r_name", "n_name", "revenue", "share")
    },
    Some("""WITH rev AS (
      |  SELECT r_name, n_name,
      |    SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS rev_dec
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY r_name, n_name)
      |SELECT r_name, n_name, CAST(rev_dec AS DOUBLE) AS revenue,
      |CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER (PARTITION BY r_name) AS DOUBLE) AS share
      |FROM rev""".stripMargin))

  /** §2.2 row replication (`slice(rep(1:n(), each = 5))`,
    * `R/estimate-catch.R:94-96`): small groups (<3 orders) replicated 5×
    * before the mean, the reference's small-sample augmentation. */
  val q22 = GQuery(
    "q22_row_replication",
    (s, d) => {
      val o = orders(s, d).withColumn("grp", col("o_custkey") % 100)
      val n = o.groupBy("grp").agg(lcount(lit(1)).as("n_rows"))
      o.join(broadcast(n), Seq("grp"))
        .withColumn("copies",
          when(col("n_rows") < lit(3), lit(5)).otherwise(lit(1)))
        .withColumn("dup", explode(expr("array_repeat(1, int(copies))")))
        .groupBy(col("grp"))
        .agg(
          lcount(lit(1)).as("n_expanded"),
          lavg6(col("o_totalprice")).as("mean_price"))
    },
    Some(s"""WITH o AS (SELECT o_custkey % 100 AS grp, o_totalprice FROM orders),
      |n AS (SELECT grp, COUNT(*) AS n_rows FROM o GROUP BY grp),
      |e AS (
      |  SELECT o.grp, o.o_totalprice
      |  FROM o JOIN n USING (grp)
      |  CROSS JOIN (SELECT unnest(range(5)) AS i) r
      |  WHERE r.i < CASE WHEN n.n_rows < 3 THEN 5 ELSE 1 END)
      |SELECT grp, COUNT(*) AS n_expanded, ${sqlLavg6("o_totalprice")} AS mean_price
      |FROM e GROUP BY grp""".stripMargin))

  /** A13 dynamic pivot_wider: labels collected from the data at plan
    * time (Spark's two-job `pivot(col)` — a distinct on the label column
    * feeds the pivot list; labels are small by definition or the wide
    * result would be unusable). The reference's `pivot_wider` never
    * declares its label set (`R/pt_nest_species.R:49`); q17 is the
    * static-labels fast path, this is the label-discovery path. */
  val q50 = GQuery(
    "q50_dynamic_pivot",
    (s, d) =>
      orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority") // no value list: labels discovered
        .agg(count(lit(1)))
        .na.fill(0),
    Some("""SELECT o_orderstatus,
      |COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
      |COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
      |COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
      |COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
      |COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
      |FROM orders GROUP BY o_orderstatus""".stripMargin))

  def queries: Seq[GQuery] = Seq(q17, q18, q19, q20, q21, q22, q50)
}
