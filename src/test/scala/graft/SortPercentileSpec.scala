package graft

import org.apache.spark.sql.functions._
import graft.stats.SortPercentile

/** SortPercentile must agree exactly with Spark's buffering `percentile`
  * aggregate (both implement R type-7) on every shape: ties, single-row
  * groups, nulls, integral/fractional positions, and p ∈ {0, 1}. */
class SortPercentileSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
  private val names = ps.map(p => s"p${(p * 100).toInt}")

  private def compare(rows: Seq[(String, java.lang.Double)]): Unit = {
    val df = rows.toDF("g", "x").repartition(4)
    val sorted = SortPercentile
      .percentiles(df, Seq("g"), col("x"), ps, names, countAs = Some("n"))
      .orderBy("g").collect()
    val agg = df.groupBy($"g")
      .agg(percentile($"x", array(ps.map(lit): _*)).as("v"), count(lit(1)).as("n"))
      .orderBy("g").collect()
    assert(sorted.length == agg.length)
    sorted.zip(agg).foreach { case (s, a) =>
      val expected = a.getSeq[Double](1)
      ps.indices.foreach { i =>
        val got = if (s.isNullAt(1 + i)) null else s.getDouble(1 + i)
        val want = if (expected == null || a.isNullAt(1)) null else expected(i)
        assert(got == want, s"group=${s.getString(0)} p=${ps(i)}: $got != $want")
      }
      assert(s.getLong(1 + ps.length) == a.getLong(2), "row count")
    }
  }

  test("matches the percentile aggregate on mixed groups") {
    compare(Seq(
      ("a", 5.0), ("a", 1.0), ("a", 3.0), ("a", 3.0), ("a", 2.0),
      ("b", 10.0), ("b", 20.0),
      ("c", 7.5),
      ("d", 1.0), ("d", 1.0), ("d", 1.0)))
  }

  test("null values count rows but never enter a percentile") {
    compare(Seq(
      ("a", 4.0), ("a", null), ("a", 8.0), ("a", null), ("a", 6.0),
      ("b", null), ("b", null))) // all-null group: null percentiles, n=2
  }

  test("pseudo-random multiset parity") {
    val rows = (0 until 500).map { i =>
      val g = s"g${i % 3}"
      // deterministic irregular values with ties
      ("" + g, java.lang.Double.valueOf(((i * 2654435761L) % 97).toDouble / 7.0))
    }
    compare(rows)
  }

  test("fromCounts consumes a pre-aggregated histogram") {
    val hist = Seq(("a", 1.0, 3L), ("a", 2.0, 1L), ("b", 5.0, 2L))
      .toDF("g", "v", "c")
    val out = SortPercentile
      .fromCounts(hist, Seq("g"), "v", "c", Seq(0.5), Seq("med"))
      .orderBy("g").collect()
    // a: values (1,1,1,2) -> median 1.0 ; b: (5,5) -> 5.0
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 1.0), ("b", 5.0)))
  }
}
