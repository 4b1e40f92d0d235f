package graft

import graft.operators.ChangePoint
import org.apache.spark.sql.functions._

class ChangePointSpec extends SparkSpec {
  import spark.implicits._

  private def cp(xs: Seq[Long]) =
    ChangePoint.cusum(
        xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("ord", "x"),
        "ord", "x")
      .select($"ord", $"i", $"n", $"mean_before", $"mean_after")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head

  test("planted level shift: argmax lands on the last pre-shift index") {
    // 10, 10, 10, 10, 50, 50, 50, 50 — |S_i| peaks at i = 4 (ord 3)
    val (ord, i, n, before, after) = cp(Seq(10, 10, 10, 10, 50, 50, 50, 50))
    assert((ord, i, n) == ((3L, 4L, 8L)))
    assert(before == 10L && after.contains(50L))
  }

  test("constant series: zero score everywhere, tie breaks to the first row") {
    val (ord, i, _, before, after) = cp(Seq(7, 7, 7, 7))
    assert(ord == 0L && i == 1L)
    assert(before == 7L && after.contains(7L))
  }

  test("shift at the tail: argmax can be the last row, mean_after NULL") {
    // monotone drift puts the max |cusum| mid-series, but a single
    // huge final value drags the argmax to n-1; craft the extreme:
    val (ord, i, n, _, after) = cp(Seq(0, 0, 0, 1000))
    assert(ord == 2L && i == 3L && n == 4L, "last zero is the split point")
    assert(after.contains(1000L))
  }

  test("negative values: truncating means agree with the SQL mirror's semantics") {
    // both Spark `div` and DuckDB `//` truncate toward zero, so a
    // negative-mean segment is safe; pin the behavior here
    val (ord, i, _, before, after) = cp(Seq(-9, -9, -9, 21, 21, 21))
    assert(ord == 2L && i == 3L)
    assert(before == -9L && after.contains(21L))
  }

  test("result is invariant under input partitioning") {
    val df = (1 to 40).map(j => (j.toLong, if (j <= 25) 5L else 9L))
      .toDF("ord", "x")
    val a = ChangePoint.cusum(df, "ord", "x").collect().toSeq
    val b = ChangePoint.cusum(df.repartition(13), "ord", "x").collect().toSeq
    assert(a == b)
    assert(a.head.getAs[Long]("i") == 25L)
  }
}
