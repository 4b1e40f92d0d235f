package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Exact (order-independent) numeric aggregation helpers.
  *
  * Floating-point summation is not associative, so a parallel Spark sum
  * and a single-threaded oracle sum of the same doubles can differ in
  * the last ULPs. To make aggregates bit-reproducible regardless of
  * partitioning/parallelism (local[32] today, 1000 executors at 100 TB),
  * we route sums through DECIMAL(38,6): the per-value double→decimal
  * conversion is deterministic, decimal addition is exact and
  * associative, and the final decimal→double cast is one deterministic
  * rounding. The matching SQL shape (for any ANSI oracle) is
  * `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`.
  */
object Exact {
  val Dec: DecimalType = DecimalType(38, 6)

  /** Order-independent exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact mean: exact sum divided by the non-null count (single IEEE
    * division, deterministic). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Windowed exact sum. */
  def dsumOver(c: Column, w: WindowSpec): Column =
    sum(c.cast(Dec)).over(w).cast(DoubleType)

  /** Long count cast, for parity with BIGINT oracles. */
  def lcount(c: Column): Column = count(c).cast(LongType)

  /** Exact order-independent sum at integer-add speed: each double is
    * scaled to micros with pure IEEE arithmetic (`floor(x·1e6 + 0.5)` —
    * identical in any IEEE-754 engine, unlike decimal/round casts whose
    * per-row `BigDecimal.valueOf` string round-trip costs ~10× the add)
    * and summed as int64, which is associative, so the result is
    * bit-identical at any parallelism. A conservative overflow guard
    * (count · max|scaled| < 9.0e18) nulls the result instead of wrapping
    * — the guard is deterministic, so an oracle mirroring the same
    * formula (see [[sqlLsum6]]) still hash-matches.
    *
    * Choose [[lsum6]] when |x|·1e6 · rows stays well under 2^63 (true
    * for log-scale features, rates, km-scale distances at any row
    * count that matters); choose [[dsum]] when magnitudes are unbounded
    * — same determinism, decimal-add cost. */
  def lsum6(c: Column): Column = lsumAt(c, 1e6)

  /** [[lsum6]] at a caller-chosen power-of-ten scale: small-magnitude
    * sums (e.g. nutrient masses ~ 1e-7 · catch) need finer fixed-point
    * resolution than micros, and the overflow guard makes any scale
    * safe to try — too fine a scale nulls out rather than wrapping. */
  def lsumAt(c: Column, scale: Double): Column = {
    val scaled = floor(c * lit(scale) + lit(0.5)).cast(LongType)
    when(count(c).cast(DoubleType) * max(abs(scaled)).cast(DoubleType) < lit(9.0e18),
      sum(scaled).cast(DoubleType) / lit(scale))
  }

  /** Exact mean on the scaled-long fast path. */
  def lavg6(c: Column): Column = lsum6(c) / count(c)

  // --- matching ANSI SQL snippets for oracle strings ---
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE)"
  def sqlDavg(expr: String): String =
    s"(${sqlDsum(expr)} / COUNT($expr))"
  def sqlLsum6(expr: String): String = sqlLsumAt(expr, "1000000.0")

  /** ANSI mirror of [[lsumAt]]; `scale` is the literal text (e.g.
    * "1e12") so both engines parse the identical double. */
  def sqlLsumAt(expr: String, scale: String): String =
    s"""CASE WHEN CAST(COUNT($expr) AS DOUBLE) *
       | CAST(MAX(abs(CAST(floor(($expr) * $scale + 0.5) AS BIGINT))) AS DOUBLE) < 9.0e18
       | THEN CAST(SUM(CAST(floor(($expr) * $scale + 0.5) AS BIGINT)) AS DOUBLE) / $scale
       | END""".stripMargin.replace("\n", "")
  def sqlLavg6(expr: String): String =
    s"(${sqlLsum6(expr)} / COUNT($expr))"

  /** Exact sum of a NONNEGATIVE int64 column whose TOTAL may overflow
    * int64 (e.g. Σ of e2-scaled price products ≤ 10¹⁴ each): the
    * per-row value splits into high/low halves at bit 30
    * (shift + mask — pure long ops, identical in any engine on the
    * nonnegative contract), both halves sum at long-add speed inside
    * whole-stage codegen, and the halves recombine into one
    * DECIMAL(38,0) after aggregation — the same value a
    * DECIMAL(38,0)-routed sum produces, without boxing a 38-digit
    * Decimal per row (measured on q306's 15-moment scan at sf1:
    * decimal-multiply 9.3 s → decimal-add 6.7 s → split-long sums
    * below that). Caller contract: values nonnegative and
    * row count · (value ≫ 30) < 9·10¹⁸ — true for e2-scale products
    * at any realistic fact count. */
  def lsumSplit(c: Column): Column =
    (sum(shiftright(c, 30)).cast(DecimalType(38, 0)) * lit(1L << 30) +
      sum(c.bitwiseAND(lit((1L << 30) - 1))).cast(DecimalType(38, 0)))
      .cast(DecimalType(38, 0))

  /** ANSI mirror of [[lsumSplit]]. */
  def sqlLsumSplit(expr: String): String =
    s"""CAST(CAST(SUM(($expr) >> 30) AS HUGEINT) * ${1L << 30}
       | + CAST(SUM(($expr) & ${(1L << 30) - 1}) AS HUGEINT) AS HUGEINT)"""
      .stripMargin.replace("\n", "")
}
