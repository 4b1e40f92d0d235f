package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Exact

/** [[Exact.lsumSplit]] — the long-speed exact sum for nonnegative
  * int64 values whose TOTAL overflows int64: bit-parity with the
  * DECIMAL(38,0)-routed sum it replaces, correctness past the int64
  * total boundary, partitioning invariance, and empty/null behavior
  * matching `sum`. */
class LsumSplitSpec extends SparkSpec {
  import spark.implicits._

  private val dec = DecimalType(38, 0)

  test("equals the decimal-routed sum on e2-product magnitudes") {
    val df = (1L to 10000L).map(i => (i * 7919L) % 100000007L).toDF("v")
    val got = df.agg(Exact.lsumSplit(col("v"))).as[java.math.BigDecimal].head()
    val want = df.agg(sum(col("v").cast(dec))).as[java.math.BigDecimal].head()
    assert(got.compareTo(want) == 0)
  }

  test("correct past the int64 total boundary") {
    // 4000 values near Long.MaxValue/1000: total ~ 3.7e19 > 9.2e18
    val big = 9223372036854775L * 1000 - 975807L // Long.MaxValue - 975806 is odd; pick < max
    val df = (1L to 4000L).map(i => big - i).toDF("v")
    val got = df.agg(Exact.lsumSplit(col("v"))).as[java.math.BigDecimal].head()
    val want = (1L to 4000L).map(i => BigInt(big - i)).sum
    assert(BigInt(got.toBigInteger) == want)
  }

  test("partitioning-invariant (repartition changes nothing)") {
    val df = (1L to 5000L).map(i => (i * i) % 999999937L).toDF("v")
    val a = df.agg(Exact.lsumSplit(col("v"))).as[java.math.BigDecimal].head()
    val b = df.repartition(17).agg(Exact.lsumSplit(col("v")))
      .as[java.math.BigDecimal].head()
    assert(a.compareTo(b) == 0)
  }

  test("SQL mirror computes the identical value in Spark's own SQL") {
    val df = (1L to 2000L).map(i => (i * 104729L) % 1000003L).toDF("v")
    df.createOrReplaceTempView("lsum_split_probe")
    // the DuckDB spelling is ANSI except `//`; Spark's `div` is the
    // same floor-division on nonnegatives — proves the shape, DuckDB
    // parity itself is proven by the q306/q315 hash gates
    val viaSql = spark.sql(
      s"""SELECT CAST(CAST(SUM(v >> 30) AS DECIMAL(38,0)) * ${1L << 30}
         | + CAST(SUM(v & ${(1L << 30) - 1}) AS DECIMAL(38,0)) AS DECIMAL(38,0))
         |FROM lsum_split_probe""".stripMargin)
      .as[java.math.BigDecimal].head()
    val viaCol = df.agg(Exact.lsumSplit(col("v"))).as[java.math.BigDecimal].head()
    assert(viaSql.compareTo(viaCol) == 0)
  }
}
