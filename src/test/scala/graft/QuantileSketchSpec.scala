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

  test("state algebra, exact regime: fine states merged == rows aggregated directly == type-7") {
    graft.functions.KllAlgebra.register(spark)
    val df = (1 to 4000).map(i => (i % 7, ((i * 2654435761L) % 9973).toDouble))
      .toDF("g", "v").repartition(11)
    df.createOrReplaceTempView("kll_alg")
    // fine grain: one state per g, then a state-merge to the all grain
    val merged = spark.sql(
      """SELECT kll_value(kll_merge(st, 8192), 0.5) AS p50,
        |       kll_n(kll_merge(st, 8192)) AS n
        |FROM (SELECT g, kll_state(v, 8192) AS st FROM kll_alg GROUP BY g)""".stripMargin)
      .as[(Double, Long)].head()
    val direct = spark.sql(
      "SELECT quantile_sketch(v, 0.5, 8192) AS p50, COUNT(*) AS n FROM kll_alg")
      .as[(Double, Long)].head()
    val exact = spark.sql("SELECT percentile(v, 0.5) FROM kll_alg").as[Double].head()
    assert(merged == direct)
    assert(merged._1 == exact && merged._2 == 4000L)
  }

  test("state algebra, approximate regime: merged estimate stays inside the KLL rank bound") {
    graft.functions.KllAlgebra.register(spark)
    val n = 100000
    val cap = 128
    val df = (1 to n).map(i => (i % 13, ((i * 48271L) % 1000003).toDouble))
      .toDF("g", "v").repartition(7)
    df.createOrReplaceTempView("kll_alg2")
    val sorted = (1 to n).map(i => ((i * 48271L) % 1000003).toDouble).sorted
    Seq(0.1, 0.5, 0.9).foreach { p =>
      val est = spark.sql(
        s"""SELECT kll_value(kll_merge(st, $cap), $p)
           |FROM (SELECT g, kll_state(v, $cap) AS st FROM kll_alg2 GROUP BY g)""".stripMargin)
        .as[Double].head()
      val rank = sorted.count(_ <= est)
      val eps = 3.0 * math.log(n.toDouble / cap) / cap // loose KLL-style bound
      assert(math.abs(rank - n * p) <= eps * n,
        s"p=$p est=$est rank=$rank tol=${eps * n}")
    }
    // total weight is conserved to within +-1 per compaction
    val w = spark.sql(
      s"""SELECT kll_n(kll_merge(st, $cap))
         |FROM (SELECT g, kll_state(v, $cap) AS st FROM kll_alg2 GROUP BY g)""".stripMargin)
      .as[Long].head()
    // ±1 per compaction, parity-cancelled in pairs: residual ≲ Σ_ℓ 2^ℓ ≈ 2%
    assert(math.abs(w - n) <= n / 20, s"weight $w drifted from $n")
  }

  test("state algebra: re-capping at merge time (merge cap < build cap) degrades within the smaller cap's bound") {
    graft.functions.KllAlgebra.register(spark)
    val n = 20000
    val df = (1 to n).map(i => (i % 5, ((i * 48271L) % 99991).toDouble))
      .toDF("g", "v").repartition(3)
    df.createOrReplaceTempView("kll_recap")
    // fine states exact (cap 8192 > group sizes), merged under cap 128:
    // the KMV-style re-cap path — compaction fires during the merge
    val est = spark.sql(
      """SELECT kll_value(kll_merge(st, 128), 0.5)
        |FROM (SELECT g, kll_state(v, 8192) AS st FROM kll_recap GROUP BY g)""".stripMargin)
      .as[Double].head()
    val sorted = (1 to n).map(i => ((i * 48271L) % 99991).toDouble).sorted
    val rank = sorted.count(_ <= est)
    val eps = 3.0 * math.log(n.toDouble / 128) / 128
    assert(math.abs(rank - n * 0.5) <= eps * n, s"recap est=$est rank=$rank")
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
