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
        .agg(dsum(col("mean_len")).as("sum_mean_len"), lcount(lit(1)).as("n"))
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
      |SELECT l_returnflag, ${sqlDsum("mean_len")} AS sum_mean_len,
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
        .agg(lcount(lit(1)).as("n"), dsum(col("value")).as("sum_value")),
    Some(s"""SELECT event_type,
      |CAST(floor((value - 0.0) / 5.0) AS BIGINT) + 1 AS bin,
      |COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
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
          dsum(col("l_quantity")).as("sum_qty"))
    },
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
      |COUNT(CASE WHEN l_linenumber IS NULL THEN 1 END) AS n_childless,
      |${sqlDsum("l_quantity")} AS sum_qty
      |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus""".stripMargin))

  def queries: Seq[GQuery] = Seq(q45, q46, q47)
}
