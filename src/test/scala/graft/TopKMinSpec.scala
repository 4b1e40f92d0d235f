package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKMin

class TopKMinSpec extends SparkSpec {
  import spark.implicits._

  test("k smallest ascending, duplicates kept, nulls skipped, merge across partitions") {
    TopKMin.register(spark)
    val df = Seq[(String, java.lang.Double)](
      ("a", 5.0), ("a", 1.0), ("a", 3.0), ("a", 2.0), ("a", 2.0), ("a", null),
      ("b", 9.0), ("b", 7.0)) // group smaller than k
      .toDF("g", "x").repartition(4) // forces partial buffers + heap merge
    val got = df.groupBy($"g")
      .agg(call_function("top_k_min", $"x", lit(3)).as("tops"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    assert(got("a") == List(1.0, 2.0, 2.0))
    assert(got("b") == List(7.0, 9.0))
  }

  test("matches sort+limit semantics on the real table") {
    TopKMin.register(spark)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val viaAgg = li.groupBy($"l_returnflag")
      .agg(call_function("top_k_min", $"l_extendedprice", lit(4)).as("tops"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    val viaSort = li.select($"l_returnflag", $"l_extendedprice").collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) => g -> rows.map(_.getDouble(1)).sorted.take(4).toList }
    assert(viaAgg == viaSort)
  }
}
