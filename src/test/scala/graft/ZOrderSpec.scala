package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._

/** Morton clustering key: the column expression must equal the
  * reference bit-interleave, be injective on the grid, and actually
  * deliver the layout win — z-range partitions cover far tighter
  * bounding boxes than hash partitions of the same count. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("column expression equals the reference interleave (incl. edge bits)") {
    val probes = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L), (0xFFFFFFFFL, 0L),
      (0L, 0xFFFFFFFFL), (0xFFFFFFFFL, 0xFFFFFFFFL), (123456L, 654321L),
      (0x55555555L, 0x2AAAAAAAL))
    val got = probes.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == ZOrder.zValueRef(a, b), s"($a,$b)")
    }
    // bit-position sanity: a lands on even bits, b on odd
    assert(ZOrder.zValueRef(1L, 0L) == 1L)
    assert(ZOrder.zValueRef(0L, 1L) == 2L)
    assert(ZOrder.zValueRef(3L, 0L) == 5L)
  }

  test("injective on the grid; truncation is the enclosing quadtree cell") {
    val n = 64
    val zs = for (a <- 0L until n; b <- 0L until n) yield ZOrder.zValueRef(a, b)
    assert(zs.distinct.size == zs.size)
    // shifting out 2k bits coarsens BOTH axes by k bits
    for (a <- Seq(5L, 37L); b <- Seq(9L, 60L))
      assert(ZOrder.zValueRef(a, b) >> 6 == ZOrder.zValueRef(a >> 3, b >> 3))
  }

  test("z-range partitions cover tighter boxes than hash partitions") {
    val pts = spark.range(20000).select(
      (col("id") % 179).cast("long").as("x"),
      ((col("id") * 7919) % 173).cast("long").as("y"))
    val z = pts.withColumn("z", ZOrder.zValue($"x", $"y"))
    def meanSpan(bucket: org.apache.spark.sql.Column): Double =
      z.groupBy(bucket.as("b"))
        .agg(((max($"x") - min($"x")) + (max($"y") - min($"y"))).as("span"))
        .agg(avg($"span")).as[Double].head()
    val zSpan = meanSpan(shiftright($"z", 8)) // z-range cells
    val hashSpan = meanSpan(abs(hash($"x", $"y")) % 64) // hash layout, similar bucket count
    assert(zSpan * 4 < hashSpan,
      s"z-layout span $zSpan should be far tighter than hash layout $hashSpan")
  }
}
