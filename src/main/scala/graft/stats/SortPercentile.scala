package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact R-type-7 percentiles computed relationally — a distributed
  * (value, count) histogram plus a windowed cumulative sum — instead of
  * Spark's `percentile` aggregate, which buffers every distinct value of
  * a group in one task's memory (`OpenHashMap[AnyRef, Long]` inside
  * `Percentile`).
  *
  * Why this scales where the aggregate doesn't: the histogram groupBy
  * shuffles on (keys, value) — full cluster parallelism, map-side
  * combine — and the per-key cumulative window is a spillable sort over
  * the *distinct* values, not an in-memory map. A 100 TB column with a
  * few giant groups sorts and spills; the buffering aggregate OOMs.
  *
  * Parity: identical interpolation to Spark's `Percentile.getPercentile`
  * (and DuckDB's `quantile_cont`, R type 7): with sorted values x[0..n-1]
  * and pos = p·(n−1), result = (ceil(pos)−pos)·x[floor(pos)] +
  * (pos−floor(pos))·x[ceil(pos)] — the exact double arithmetic order of
  * the built-in aggregate, so the two are bit-identical, not merely
  * close.
  */
object SortPercentile {

  /** Per-key exact percentiles of `x`.
    *
    * @param ps    percentages in [0, 1]
    * @param names output column name per percentage
    * @param countAs when set, adds a column with the total row count per
    *   key (ALL rows, null `x` included — `COUNT(*)` parity)
    * @return keys ++ names (++ countAs)
    */
  def percentiles(df: DataFrame, keys: Seq[String], x: Column,
                  ps: Seq[Double], names: Seq[String],
                  countAs: Option[String] = None): DataFrame = {
    val counts = df
      .groupBy(keys.map(col) :+ x.as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    fromCounts(counts, keys, "__v", "__c", ps, names, countAs, assumeUnique = true)
  }

  /** Percentiles over a pre-aggregated (value, weight) histogram.
    * Null values contribute to `countAs` but never to a percentile
    * (quantile_cont semantics). */
  /** @param assumeUnique skip the defensive (keys, value) re-aggregation
    *   when the caller guarantees one row per (keys, value) — duplicate
    *   rows would otherwise give overlapping cumulative ranges and
    *   wrong/null percentiles
    * @param extraAggs (aggregate, output name) pairs evaluated in the
    *   same per-key pass over the histogram (columns `v` and `c` are in
    *   scope) — lets callers fold side statistics (e.g. a nonzero
    *   census) into the percentile aggregation instead of
    *   re-aggregating the histogram in a second branch and joining */
  def fromCounts(counts0: DataFrame, keys: Seq[String], v: String, c: String,
                 ps: Seq[Double], names: Seq[String],
                 countAs: Option[String] = None,
                 assumeUnique: Boolean = false,
                 extraAggs: Seq[(Column, String)] = Nil): DataFrame = {
    require(ps.length == names.length, "one output name per percentage")
    val kc = keys.map(col)
    val counts =
      if (assumeUnique) counts0
      else counts0.groupBy(kc :+ col(v): _*).agg(sum(col(c)).as(c))
    // cumulative count in value order and per-key total, same hash
    // partitioning for both windows — one exchange, two sorts max
    val wRun = Window.partitionBy(kc: _*).orderBy(col(v).asc_nulls_first)
    val wAll = Window.partitionBy(kc: _*)
    val nn = when(col(v).isNotNull, col(c)).otherwise(lit(0L))
    val staged = counts
      .withColumn("__cum", sum(nn).over(wRun)) // nulls sort first: cum of non-null so far
      .withColumn("__n", sum(nn).over(wAll))
      .withColumn("__nall", sum(col(c)).over(wAll))
    // 0-indexed pos = p(n−1); a histogram row (v, cum, c) covers sorted
    // positions [cum−c, cum−1]; exactly one row covers lo (and hi)
    val aggs = ps.zip(names).flatMap { case (p, name) =>
      val pos = lit(p) * (col("__n").cast("double") - 1.0)
      val lo = floor(pos).cast("long")
      val hi = ceil(pos).cast("long")
      def at(idx: Column): Column =
        max(when(col(v).isNotNull &&
          idx >= col("__cum") - nn && idx < col("__cum"), col(v)))
      Seq(at(lo).as(s"__lo_$name"), at(hi).as(s"__hi_$name"),
        max(ceil(pos) - pos).as(s"__wl_$name"),
        max(pos - floor(pos)).as(s"__wh_$name"),
        max(hi === lo).as(s"__eq_$name"))
    } ++ countAs.map(n => max(col("__nall")).as(n)).toSeq ++
      extraAggs.map { case (a, n) => a.as(n) }
    val extraNames = extraAggs.map(_._2)
    val out = staged.groupBy(kc: _*).agg(aggs.head, aggs.tail: _*)
    val withVals = ps.zip(names).foldLeft(out) { case (d, (_, name)) =>
      d.withColumn(name,
        when(col(s"__eq_$name") || col(s"__hi_$name").isNull,
          col(s"__lo_$name"))
          .otherwise(col(s"__wl_$name") * col(s"__lo_$name") +
            col(s"__wh_$name") * col(s"__hi_$name")))
    }
    withVals.select((kc ++ names.map(col) ++ countAs.map(col) ++
      extraNames.map(col)): _*)
  }
}
