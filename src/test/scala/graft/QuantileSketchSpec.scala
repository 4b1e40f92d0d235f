package graft

import graft.functions.QuantileSketch
import org.apache.spark.sql.functions._

/** Quantile sketch: exact-regime parity with the `percentile`
  * aggregate, and approximate-regime rank-error bounds under
  * adversarial input orders and partitionings. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  QuantileSketch.register(spark)

  test("exact regime reproduces type-7 percentiles bit-for-bit") {
    val df = (1 to 5000).map(i => ((i * 2654435761L) % 9973).toDouble)
      .toDF("v").repartition(13)
    df.createOrReplaceTempView("qs_exact")
    val got = spark.sql(
      """SELECT quantile_sketch(v, 0.25, 8192) AS p25,
        |       quantile_sketch(v, 0.5, 8192) AS p50,
        |       quantile_sketch(v, 0.99, 8192) AS p99
        |FROM qs_exact""".stripMargin)
      .as[(Double, Double, Double)].head()
    val want = spark.sql(
      """SELECT percentile(v, 0.25), percentile(v, 0.5), percentile(v, 0.99)
        |FROM qs_exact""".stripMargin)
      .as[(Double, Double, Double)].head()
    assert(got == want)
  }

  test("approximate regime: rank error bounded on adversarial orders") {
    val n = 200000
    val cap = 256
    // sorted, reversed, and hash-shuffled arrivals of the same multiset
    val orders = Seq(
      (1 to n).map(_.toDouble),
      (1 to n).reverse.map(_.toDouble),
      (1 to n).sortBy(i => (i * 2654435761L) % 1000003).map(_.toDouble))
    for (vals <- orders) {
      val df = vals.toDF("v").repartition(32)
      df.createOrReplaceTempView("qs_approx")
      for (p <- Seq(0.1, 0.5, 0.9)) {
        val est = spark.sql(
          s"SELECT quantile_sketch(v, $p, $cap) FROM qs_approx").as[Double].head()
        // true quantile of 1..n at p is 1 + (n-1)p; tolerated rank error:
        // each compaction at level h shifts ranks by <= 2^h, there are
        // <= n/(cap*2^h) compactions per level over log2(n/cap) levels
        // -> eps*n with eps = 2*log2(n/cap)/cap
        val truth = 1.0 + (n - 1) * p
        val eps = 2.0 * (math.log(n.toDouble / cap) / math.log(2.0)) / cap
        assert(math.abs(est - truth) <= eps * n + 1,
          s"p=$p est=$est truth=$truth tol=${eps * n}")
      }
    }
  }

  test("empty and null-only groups evaluate to null") {
    Seq((1, Option.empty[Double]), (1, None), (2, Some(3.0)))
      .toDF("g", "v").createOrReplaceTempView("qs_null")
    val out = spark.sql(
      """SELECT g, quantile_sketch(v, 0.5, 16) AS q
        |FROM qs_null GROUP BY g ORDER BY g""".stripMargin)
      .as[(Int, Option[Double])].collect().toSeq
    assert(out == Seq((1, None), (2, Some(3.0))))
  }
}
