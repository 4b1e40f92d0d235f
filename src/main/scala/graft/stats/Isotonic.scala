package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic calibration (pool-adjacent-violators) over reliability
  * buckets — the calibrator TRAINER beside the q200 census: given
  * (score, binary label) pairs, fit the monotone nondecreasing step
  * function minimizing squared error, the standard post-hoc calibrator
  * (Zadrozny & Elkan 2002) and the exact solution PAV computes.
  *
  * Scale shape: raw pairs aggregate once into B fixed-width score
  * buckets (one shuffle, map-side combined); the fit then runs on the
  * BOUNDED B-row frame via the minimax closed form
  *
  *   fitted(i) = max_{j ≤ i} min_{k ≥ i} ( Σ_{b=j..k} y_b / Σ n_b )
  *
  * (Robertson–Wright–Dykstra, Order Restricted Statistical Inference,
  * eq. 1.9–1.13) — B³/6 interval rows, CONSTANT in the corpus size,
  * all from integer prefix sums, so no sequential pooling loop exists
  * anywhere and the whole fit replays in ANSI SQL. Counts stay int64
  * until one final division per interval; ties across intervals
  * cannot diverge between engines because min/max compare identical
  * doubles. */
object Isotonic {

  /** @return per observed bucket: (bucket, n, sum_y, raw_rate, fitted)
    *         with fitted monotone nondecreasing in bucket. */
  def calibrate(df: DataFrame, scoreCol: String, labelCol: String,
                nBuckets: Int): DataFrame = {
    val b = least(floor(col(scoreCol) * nBuckets), lit(nBuckets - 1))
      .cast("long").as("bucket")
    val per = df.select(b, col(labelCol).cast("long").as("y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sum_y"))
    // bounded frame from here on: B rows, B²/2 intervals, B³/6 triples
    val w = Window.partitionBy().orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val pre = per
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("cy", sum(col("sum_y")).over(w))
    val lo = pre.select(col("bucket").as("j"),
      (col("cn") - col("n")).as("cn0"), (col("cy") - col("sum_y")).as("cy0"))
    val hi = pre.select(col("bucket").as("k"), col("cn"), col("cy"))
    val intervals = lo.join(hi, col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cy") - col("cy0")).cast("double") /
          (col("cn") - col("cn0"))).as("avg"))
    val fitted = intervals
      .join(per.select(col("bucket").as("i")),
        col("j") <= col("i") && col("i") <= col("k"))
      .groupBy(col("i"), col("j")).agg(min(col("avg")).as("mn"))
      .groupBy(col("i")).agg(max(col("mn")).as("fitted0"))
    per.join(fitted, per("bucket") === fitted("i"))
      .select(col("bucket"), col("n"), col("sum_y"),
        round(col("sum_y").cast("double") / col("n"), 6).as("raw_rate"),
        round(col("fitted0"), 6).as("fitted"))
  }

  /** Apply a fitted calibrator ([[calibrate]] output) to NEW scores —
    * the serving half of the calibrator: each score lands in its
    * fixed-width bucket and takes the step function's value there.
    * Buckets the training data never observed get STEP semantics (the
    * last fitted value at a lower bucket — a step function is constant
    * until the next knot), and scores below the first observed bucket
    * clamp to the first step (the standard isotonic extrapolation:
    * the fit is only defined on the observed range, monotone
    * continuation is constant).
    *
    * Scale shape: the fit densifies to all B buckets on its BOUNDED
    * B-row frame (the single-partition windows run over B rows, never
    * data rows) and broadcast-equi-joins onto the scores — one
    * codegen'd hash lookup per row, no range join, no per-row search.
    *
    * @return df + (bucket, outCol) */
  def applyFit(df: DataFrame, scoreCol: String, fit: DataFrame,
               nBuckets: Int, outCol: String = "calibrated"): DataFrame = {
    val all = fit.sparkSession.range(nBuckets).select(col("id").as("bucket"))
    val wF = Window.partitionBy().orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wB = Window.partitionBy().orderBy(col("bucket"))
      .rowsBetween(0, Window.unboundedFollowing)
    val dense = all
      .join(fit.select(col("bucket"), col("fitted")), Seq("bucket"), "left")
      .withColumn("__ff", last(col("fitted"), ignoreNulls = true).over(wF))
      .withColumn("__bf", first(col("fitted"), ignoreNulls = true).over(wB))
      .select(col("bucket"), coalesce(col("__ff"), col("__bf")).as(outCol))
    df.withColumn("bucket",
        least(floor(col(scoreCol) * nBuckets), lit(nBuckets - 1)).cast("long"))
      .join(broadcast(dense), Seq("bucket"), "left")
  }
}
