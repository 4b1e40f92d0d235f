package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stride-scheduled training order — materializing a mixture plan
  * (weights per source) as a deterministic interleaved document order,
  * without ever building a global sort.
  *
  * Classic stride scheduling: the r-th document (1-based) of a source
  * with weight `w` runs at virtual time `(2r − 1) / (2w)` — sources
  * emit proportionally to weight, interleaved, stable. The key here is
  * the integer form `(2r − 1) · 10¹² div (2w)`, so ordering and
  * prefix membership are exact int64 comparisons.
  *
  * The scale property: a schedule PREFIX (epoch fraction, token
  * budget checkpoint, resume point) is `key <= t` — a per-row FILTER.
  * Nothing global is computed: the within-source rank is a
  * source-partitioned window (md5 arrival order, id tie-break), the
  * key is arithmetic on it, and consumers range-partition by key only
  * if they truly need physically ordered shards. Compare: a naive
  * "ORDER BY random() LIMIT n% per epoch" global sort at 100 TB.
  */
object Schedule {
  /** Virtual-time resolution: key ≈ (r/w) · 10⁹. At this scale the
    * int64 numerator (2r−1)·10⁹ holds to r ≈ 4.6·10⁹ rows per source —
    * beyond any single source that shouldn't itself be sharded — and
    * keys of distinct ranks stay distinct while w ≤ 10⁹ (ties are
    * broken by (source, id) regardless). */
  val Scale = 1000000000L

  /** Schedule key per row: requires a positive integer `weightCol`
    * (tickets — e.g. the source's planned token share). Rows of weight
    * w occupy virtual times ~ r/w, so a threshold t keeps about
    * `t·w/Scale` documents of each source. Deterministic: rank is md5
    * order of `idCol` (the suite's seeded-draw convention), ties by id. */
  def withScheduleKey(docs: DataFrame, idCol: String, sourceCol: String,
                      weightCol: String): DataFrame = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    docs.withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("schedule_key",
        expr(s"(2 * __r - 1) * ${Scale}L div (2 * $weightCol)"))
      .drop("__r")
  }

  /** Per-source census of a schedule prefix: how many documents (and
    * which — id-sum checksum) run before virtual time `threshold`. */
  def prefixCensus(keyed: DataFrame, idCol: String, sourceCol: String,
                   threshold: Long): DataFrame =
    keyed.filter(col("schedule_key") <= threshold)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(idCol)).as("id_checksum"))
}
