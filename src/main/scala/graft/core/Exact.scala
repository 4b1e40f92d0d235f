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

  // --- matching ANSI SQL snippets for oracle strings ---
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE)"
  def sqlDavg(expr: String): String =
    s"(${sqlDsum(expr)} / COUNT($expr))"
}
