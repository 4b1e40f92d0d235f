package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private release of grouped corpus statistics.
  *
  * The publish side of the pipeline already suppresses small groups
  * (k-anonymity, q159) — this is the stronger mechanism a corpus-stats
  * release at 100 TB would actually ship: per-record contribution
  * clamping, Laplace noise calibrated to sensitivity/epsilon, and a
  * noisy-threshold release rule, all as codegen'd column expressions
  * (one shuffle: the groupBy itself).
  *
  * Determinism: the noise draw is a seeded md5-uniform pushed through
  * the Laplace inverse CDF — the same replayable-draw policy the
  * pipeline uses everywhere randomness appears (ST8; grouped sampling
  * q15, PMM donors q51). Any engine (the DuckDB oracle included) can
  * replay the release bit-for-bit, which also makes the mechanism
  * auditable: the published artifact can be re-derived and diffed.
  * (A production release would swap the seed for a secret drawn once
  * per release; the mechanism is unchanged.)
  *
  * Laplace inverse CDF: with u uniform on (0,1) and c = u - 1/2,
  * noise = -b * sgn(c) * ln(1 - 2|c|), b = sensitivity / epsilon.
  */
object Privacy {
  private val TwoTo52 = 4503599627370496.0 // 2^52, 13 hex digits

  /** Deterministic uniform in (0,1) from a seeded md5 of `key`:
    * top 52 bits of md5(seed || key), shifted off 0 by half an ulp. */
  def uniform01(key: Column, seed: String): Column =
    (conv(substring(md5(concat(lit(seed), key)), 1, 13), 16, 10)
      .cast("double") + lit(0.5)) / lit(TwoTo52)

  /** Seeded Laplace(0, b) noise keyed by `key`. */
  def laplaceNoise(key: Column, seed: String, b: Double): Column = {
    val c = uniform01(key, seed) - lit(0.5)
    lit(-b) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
  }

  /** Epsilon-DP release of per-group document count and (clamped)
    * character mass.
    *
    * - each record's char contribution is clamped to `clampChars`
    *   (contribution bounding — the sensitivity of the sum is then
    *   `clampChars`, not the unbounded max document length);
    * - count gets Laplace(1/eps) noise, mass Laplace(clampChars/eps)
    *   (the two releases each spend `eps`; sequential composition
    *   makes the pair 2*eps overall — callers budget accordingly);
    * - only groups whose NOISED count clears `releaseMin` are
    *   published (noisy-threshold suppression: whether a group appears
    *   at all depends on no single record).
    *
    * Noised values are rounded to 4 decimals: the release grain, and
    * libm-ulp-proof for cross-engine replay. */
  def dpRelease(
      df: DataFrame,
      keys: Seq[String],
      seed: String,
      eps: Double,
      clampChars: Long,
      charsCol: String,
      releaseMin: Double): DataFrame = {
    val groupKey = concat_ws("", keys.map(col): _*)
    val noisedN = col("n_docs") +
      laplaceNoise(concat(lit("n:"), groupKey), seed, 1.0 / eps)
    val noisedM = col("char_mass") +
      laplaceNoise(concat(lit("m:"), groupKey), seed, clampChars / eps)
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(least(col(charsCol), lit(clampChars))).as("char_mass"))
      .withColumn("dp_n_docs", round(noisedN, 4))
      .withColumn("dp_char_mass", round(noisedM, 4))
      .filter(col("dp_n_docs") >= releaseMin)
      .drop("n_docs", "char_mass")
  }
}
