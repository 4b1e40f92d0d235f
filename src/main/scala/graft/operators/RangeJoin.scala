package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the reference assigns 1 Hz track
  * points to trips by time window per device
  * (`/root/reference/R/merge-trips.R:71-109`). A direct
  * `p.ts BETWEEN i.start AND i.end` join with only a key equi-condition
  * degenerates: Spark plans the range predicate as a post-join filter,
  * so hot keys explode into |points|·|intervals| pairs.
  *
  * The scalable form adds a BIN equi-key: intervals explode to the
  * fixed-width time bins they cover, points compute their single bin,
  * and the join runs on (keys…, bin) — a plain shuffled hash join whose
  * pair count is bounded by real temporal locality, then the exact
  * BETWEEN filter trims bin-edge false positives. Choose `binSeconds`
  * near the typical interval length: wider bins→fewer interval
  * replicas, narrower bins→fewer false-positive pairs.
  */
object RangeJoin {

  /** Replication guard: one bad-data interval with a far-future end
    * (or a too-small `binSeconds`) would otherwise generate an
    * enormous `sequence()` array and kill the whole job at Spark's
    * array-length limit with no hint of WHICH row did it. Cap the
    * per-interval bin count and fail with a diagnostic naming the
    * span instead — data-quality errors should name the row class,
    * not surface as an executor OOM three stages later. The default
    * (1e5 bins ≈ 1e5 × binSeconds of span) is far above any honest
    * interval yet far below the array limit. */
  val MaxBinsPerInterval: Long = 100000L

  private def binOf(c: org.apache.spark.sql.Column, binMicros: Long) =
    (unix_micros(c) / binMicros).cast("long")

  /** End bin, guarded: raises a diagnostic error when the interval
    * covers more than `maxBins` bins. */
  private def guardedEndBin(b0: org.apache.spark.sql.Column,
                            bn: org.apache.spark.sql.Column,
                            maxBins: Long): org.apache.spark.sql.Column =
    when(bn - b0 < lit(maxBins), bn).otherwise(
      raise_error(format_string(
        "RangeJoin: interval covers %s bins of width binSeconds (cap " +
          s"$maxBins); widen binSeconds or clean the interval bounds",
        bn - b0 + 1)).cast("long"))

  /** All (point, interval) matches with
    * `interval.startCol <= point.tsCol <= interval.endCol`, equi-matched
    * on `keys` first. Both `tsCol` and the interval bounds must be
    * timestamps. A point matching k intervals appears k times (plain
    * join semantics); intervals and points with null bounds drop out.
    * Intervals spanning more than `maxBinsPerInterval` bins raise a
    * diagnostic error (see [[MaxBinsPerInterval]]). */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      tsCol: String, startCol: String, endCol: String,
                      binSeconds: Long,
                      maxBinsPerInterval: Long = MaxBinsPerInterval): DataFrame = {
    val binMicros = binSeconds * 1000000L
    // inverted/null intervals can never contain a point, and sequence()
    // rejects a descending range — drop them before binning
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("__bin",
        explode(sequence(
          binOf(col(startCol), binMicros),
          guardedEndBin(binOf(col(startCol), binMicros),
            binOf(col(endCol), binMicros), maxBinsPerInterval))))
    val pt = points.withColumn("__bin",
      (unix_micros(col(tsCol)) / binMicros).cast("long"))
    pt.join(iv, keys :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join (closed-interval
    * `a.start <= b.end && b.start <= a.end`), equi-matched on `keys`
    * first — the segment-matching primitive (track segments × trip
    * windows, maintenance windows × observations) that the
    * point-in-interval form cannot express. Same bin trick on BOTH
    * sides: each interval explodes to its covered bins, the join runs
    * on (keys…, bin), and bin-edge duplicates are eliminated exactly —
    * a pair is kept only in the FIRST bin both intervals share
    * (`greatest(binₐ_start, bin_b_start)`), so no distinct pass over
    * the (potentially huge) pair set is ever needed. Left columns keep
    * their names; right columns are suffixed `suffix`. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      startCol: String, endCol: String,
                      binSeconds: Long, suffix: String = "_r",
                      maxBinsPerInterval: Long = MaxBinsPerInterval): DataFrame = {
    val binMicros = binSeconds * 1000000L
    def binned(df: DataFrame, tag: String): DataFrame = {
      val renamed = df.columns.foldLeft(df) { (acc, c) =>
        if (keys.contains(c)) acc else acc.withColumnRenamed(c, c + tag)
      }
      renamed
        .filter(col(startCol + tag).isNotNull && col(endCol + tag).isNotNull &&
          col(startCol + tag) <= col(endCol + tag))
        .withColumn("__b0" + tag,
          (unix_micros(col(startCol + tag)) / binMicros).cast("long"))
        .withColumn("__bin",
          explode(sequence(col("__b0" + tag),
            guardedEndBin(col("__b0" + tag),
              (unix_micros(col(endCol + tag)) / binMicros).cast("long"),
              maxBinsPerInterval))))
    }
    binned(left, "").join(binned(right, suffix), keys :+ "__bin")
      .filter(col(startCol) <= col(endCol + suffix) &&
        col(startCol + suffix) <= col(endCol))
      // keep the pair only in the first shared bin: exact dedup with
      // no distinct/shuffle over pairs
      .filter(col("__bin") === greatest(col("__b0"), col("__b0" + suffix)))
      .drop("__bin", "__b0", "__b0" + suffix)
  }
}
