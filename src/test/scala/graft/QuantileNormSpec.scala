package graft

import graft.stats.QuantileNorm

/** Cross-rater quantile normalization: rank preservation, marginal
  * equalization across biased raters, brute-force parity on the exact
  * type-7 interpolation arithmetic, partitioning determinism. */
class QuantileNormSpec extends SparkSpec {
  import spark.implicits._

  private def norm(rows: Seq[(String, Long, Double)]) =
    QuantileNorm.toPooled(rows.toDF("rater", "item", "score"),
        "rater", "item", "score")
      .collect()
      .map(r => (r.getAs[String]("rater"), r.getAs[Long]("item")) ->
        r.getAs[Double]("normalized")).toMap

  /** Driver-side reference: same semantics, straight scala. */
  private def brute(rows: Seq[(String, Long, Double)]) = {
    val n = rows.size
    val pooled = rows.sortBy(r => (r._3, r._1, r._2)).map(_._3).toIndexedSeq
    rows.groupBy(_._1).flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      sorted.zipWithIndex.map { case (r, i) =>
        val pos = (i + 1 - 0.5) / sorted.size * (n - 1)
        val lo = math.floor(pos).toInt
        val hi = math.ceil(pos).toInt
        val v = if (hi == lo) pooled(lo)
        else (math.ceil(pos) - pos) * pooled(lo) +
          (pos - math.floor(pos)) * pooled(hi)
        (r._1, r._2) -> v
      }
    }
  }

  test("biased raters end up with the pooled marginal") {
    // rater a uniform-ish, rater b compressed low, rater c offset high
    val rows = (0L until 40L).flatMap { i =>
      val u = (i * 17 % 40).toDouble / 40
      Seq(("a", i, u), ("b", i, u * u), ("c", i, 0.5 + u / 2))
    }
    val got = norm(rows)
    // after normalization each rater's value multiset is the same:
    // ranks map to the same pooled quantiles (equal n per rater)
    val byRater = got.groupBy(_._1._1).view
      .mapValues(_.values.toSeq.sorted).toMap
    assert(byRater("a") == byRater("b") && byRater("b") == byRater("c"))
    // and ranks are preserved within each rater
    val aSorted = rows.filter(_._1 == "a").sortBy(_._3).map(_._2)
    val aNorm = aSorted.map(i => got(("a", i)))
    assert(aNorm == aNorm.sorted)
  }

  test("matches the brute-force reference bit-for-bit") {
    val rows = (0L until 23L).flatMap { i =>
      Seq(("a", i, (i * 31 % 23).toDouble / 23),
        ("b", i, (i * 7 % 19).toDouble / 19))
    }
    assert(norm(rows) == brute(rows).toMap)
  }

  test("deterministic under repartitioning") {
    val rows = (0L until 30L).flatMap(i =>
      Seq(("a", i, (i * 13 % 30).toDouble / 30), ("b", i, (i % 7).toDouble / 7)))
    val df = rows.toDF("rater", "item", "score")
    val a = QuantileNorm.toPooled(df, "rater", "item", "score")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val b = QuantileNorm.toPooled(df.repartition(7), "rater", "item", "score")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(a == b)
  }
}
