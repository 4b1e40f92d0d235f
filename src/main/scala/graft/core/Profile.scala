package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.HllSketch

/** Table profiling — the ANALYZE-TABLE surface, shaped for 100 TB:
  * every face is ONE pass over the table regardless of how many
  * columns it profiles.
  *
  *   - [[sketchProfile]]: per-column null counts + HLL distinct
  *     estimates. Width × exact `countDistinct` in one aggregation
  *     plans an Expand over width× the rows; width × constant-memory
  *     register sets ride one map-side-combined pass instead.
  *   - [[frequentValues]]: top-k values per column via a stacked
  *     census and the TopKPerKey rank rewrite (bounded per-key heap).
  *   - [[dependence]]: pairwise Cramér's V over column pairs, all
  *     contingency tables from one stacked pass; χ² through
  *     n·Σ O²⁄(rᵢcⱼ) − n with the Σ on the scaled-long exact path,
  *     so the statistic is order-independent.
  *
  * Columns are supplied as (name, key expression) pairs so callers
  * control value canonicalization — doubles should arrive e6-floored
  * (cross-engine string formatting is not stable; scaled integers
  * are). Queries q245/q246/q249 gate each face against DuckDB. */
object Profile {

  /** Per-column (n_nulls, HLL zeros/sumexp/estimate) in one pass.
    * `cols` maps column name → canonical key expression (stringly). */
  def sketchProfile(df: DataFrame, cols: Seq[(String, Column)],
                    p: Int = 9): DataFrame = {
    HllSketch.register(df.sparkSession)
    // one array of per-column hashes per row → ONE fused aggregate
    // dispatch updates all register sets (k separate hll_registers
    // buffers paid k child-eval/dispatch rounds per row — measured as
    // q245's whole constant). hash60 null-propagates, so a null key
    // is a null array slot the aggregate skips — same per-column
    // semantics as before, registers bit-identical.
    val keyed = df.select(
      array(cols.map { case (n, k) => HllSketch.hash60(k, n) }: _*).as("hs") +:
        cols.zipWithIndex.map { case ((_, k), i) =>
          k.isNull.cast("long").as(s"z_$i")
        }: _*)
    val aggs =
      Seq(count(lit(1)).as("n_rows"),
        expr(s"hll_registers_multi(hs, $p, ${cols.length})").as("rs")) ++
        cols.indices.map { i => sum(col(s"z_$i")).as(s"nn_$i") }
    val wide = keyed.agg(aggs.head, aggs.tail: _*)
    val withEst = cols.indices.foldLeft(wide) { (d, i) =>
      val r = element_at(col("rs"), i + 1)
      d.withColumn(s"zz_$i", HllSketch.zerosCol(r))
        .withColumn(s"se_$i", HllSketch.sumExpS52Col(r))
    }
    withEst.select(col("n_rows"), expr("stack(" + cols.length + ", " +
      cols.zipWithIndex.map { case ((n, _), i) =>
        s"'$n', nn_$i, zz_$i, se_$i"
      }.mkString(", ") +
      ") as (col_name, n_nulls, zeros, sumexp_s52)"))
      .withColumn("est_distinct_e6",
        floor(HllSketch.estimateCol(col("zeros"), col("sumexp_s52"), p)
          * 1e6 + 0.5).cast("long"))
  }

  /** Top-`k` most frequent values per column, with counts and corpus
    * share, from one stacked census. The rank is spelled row_number +
    * filter so the TopKPerKey rewrite plans the bounded heap. */
  def frequentValues(df: DataFrame, cols: Seq[(String, Column)],
                     k: Int = 3): DataFrame = {
    val stacked = df.select(explode(array(cols.map { case (n, c) =>
        struct(lit(n).as("c"), c.cast("string").as("v"))
      }: _*)).as("kv"))
      .select(col("kv.c").as("col_name"), col("kv.v").as("value"))
    val census = stacked.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false) // rank + per-column totals
    val tot = census.groupBy(col("col_name")).agg(sum(col("n")).as("tot"))
    census
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("col_name"))
          .orderBy(col("n").desc, col("value").asc)))
      .filter(col("rank") <= k)
      .join(tot, Seq("col_name"))
      .select(col("col_name"), col("rank").cast("long").as("rank"),
        col("value"), col("n"),
        floor(col("n").cast("double") / col("tot").cast("double") * 1e6
          + 0.5).cast("long").as("share_e6"))
  }

  /** Numeric-column quantile face: count/nulls/min/max/p50/p95 per
    * column from ONE stacked pass, quantiles via the mergeable
    * [[graft.functions.QuantileSketch]] compactor (exact R type-7
    * below `cap` rows per column — the oracle regime; bounded-memory
    * KLL approximation above it — the 100 TB regime, rank error
    * property-tested in QuantileSketchSpec). The same no-Expand rule
    * as [[sketchProfile]]: sketches beside plain declarative
    * aggregates in one ObjectHashAggregate, never a per-column scan,
    * never `percentile` rows buffered per group. */
  def quantiles(df: DataFrame, cols: Seq[(String, Column)],
                cap: Int = 65536): DataFrame = {
    graft.functions.QuantileSketch.register(df.sparkSession)
    val stacked = df.select(explode(array(cols.map { case (n, c) =>
        struct(lit(n).as("c"), c.cast("double").as("v"))
      }: _*)).as("kv"))
      .select(col("kv.c").as("col_name"), col("kv.v").as("v"))
    stacked.groupBy(col("col_name"))
      .agg(
        count(col("v")).as("n"),
        (count(lit(1)) - count(col("v"))).as("n_nulls"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        round(call_function("quantile_sketch", col("v"), lit(0.5), lit(cap)), 6)
          .as("p50"),
        round(call_function("quantile_sketch", col("v"), lit(0.95), lit(cap)), 6)
          .as("p95"))
  }

  /** Pairwise Cramér's V for (pair name, a, b) column triples — all
    * contingency tables from one stacked pass. */
  def dependence(df: DataFrame,
                 pairs: Seq[(String, Column, Column)]): DataFrame = {
    val stacked = df.select(explode(array(pairs.map { case (n, a, b) =>
        struct(lit(n).as("pair"), a.cast("string").as("a"),
          b.cast("string").as("b"))
      }: _*)).as("kv"))
      .select(col("kv.pair").as("pair"), col("kv.a").as("a"),
        col("kv.b").as("b"))
    val cont = stacked.groupBy(col("pair"), col("a"), col("b"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(eager = false) // margins + totals + terms
    val ra = cont.groupBy(col("pair"), col("a")).agg(sum(col("o")).as("ra"))
    val cb = cont.groupBy(col("pair"), col("b")).agg(sum(col("o")).as("cb"))
    val nn = cont.groupBy(col("pair")).agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("r"), countDistinct(col("b")).as("c"))
    val term = (col("o") * col("o")).cast("double") /
      (col("ra") * col("cb")).cast("double")
    cont.join(ra, Seq("pair", "a")).join(cb, Seq("pair", "b"))
      .withColumn("__t", term)
      .groupBy(col("pair"))
      .agg(Exact.lsumAt(col("__t"), 1e12).as("s"))
      .join(nn, Seq("pair"))
      .withColumn("chi2", col("n").cast("double") * col("s") -
        col("n").cast("double"))
      .select(col("pair"), col("n"), col("r"), col("c"),
        floor(col("chi2") * 1e6 + 0.5).cast("long").as("chi2_e6"),
        floor(sqrt(col("chi2") / (col("n") * (least(col("r"), col("c")) - 1))
          .cast("double")) * 1e6 + 0.5).cast("long").as("cramers_v_e6"))
  }
}
