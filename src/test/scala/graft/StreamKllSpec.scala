package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.Row
import graft.streaming.StreamKll

case class KllVal(x: Double)

/** Streaming KLL: shard states merged via the q260 algebra reproduce
  * the exact batch type-7 quantiles while no compaction fires, stay
  * inside the KLL rank bound beyond capacity, and state stays bounded. */
class StreamKllSpec extends SparkSpec {
  import spark.implicits._

  private val Shards = 4

  private def latestPerShard(rows: Array[Row]): Array[Row] =
    rows.zipWithIndex.groupBy(_._1.getAs[Int]("shard"))
      .map { case (_, rs) => rs.maxBy(_._2)._1 }.toArray

  test("exact regime: streamed shards merged equal the batch percentile bit-for-bit") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KllVal]
    val out = StreamKll.sketch(in.toDF(), "x", Shards, capacity = 4096, tag = "t1")
      .writeStream.format("memory").queryName("skll1")
      .outputMode("update").start()
    val b1 = (1 to 700).map(i => KllVal(((i * 2654435761L) % 9973).toDouble))
    val b2 = (1 to 500).map(i => KllVal(((i * 48271L) % 7919).toDouble))
    try {
      in.addData(b1); out.processAllAvailable()
      in.addData(b2); out.processAllAvailable()
    } finally out.stop()
    val latest = latestPerShard(spark.table("skll1").collect())
    val latestDf = spark.createDataFrame(
      spark.sparkContext.parallelize(latest.toSeq),
      spark.table("skll1").schema)
    val got = StreamKll.mergedQuantiles(latestDf, 4096, Seq(0.5, 0.95))
      .as[(Long, Double, Double)].head()
    graft.functions.QuantileSketch.register(spark)
    val all = (b1 ++ b2).map(_.x)
    // batch target = the oracle-gated quantile_sketch aggregate (q113/
    // q260's surface) — same R-type-7 interpolation operation order;
    // Spark's own `percentile` differs from it in the final ULP
    val want = all.toDF("x")
      .selectExpr("count(*)",
        "quantile_sketch(x, 0.5, 4096)", "quantile_sketch(x, 0.95, 4096)")
      .as[(Long, Double, Double)].head()
    assert(got == want, s"stream $got != batch exact $want")
    val approxWant = all.toDF("x")
      .selectExpr("percentile(x, 0.5)", "percentile(x, 0.95)")
      .as[(Double, Double)].head()
    assert(math.abs(got._2 - approxWant._1) < 1e-9 &&
      math.abs(got._3 - approxWant._2) < 1e-9)
  }

  test("beyond capacity: merged stream estimate stays inside the KLL rank bound; state bounded") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KllVal]
    val cap = 128
    val out = StreamKll.sketch(in.toDF(), "x", Shards, capacity = cap, tag = "t2")
      .writeStream.format("memory").queryName("skll2")
      .outputMode("update").start()
    val n = 40000
    val data = (1 to n).map(i => KllVal(((i * 48271L) % 1000003).toDouble))
    try {
      data.grouped(10000).foreach { chunk =>
        in.addData(chunk); out.processAllAvailable()
      }
    } finally out.stop()
    val latest = latestPerShard(spark.table("skll2").collect())
    // state bound: O(cap · log(n/cap)) doubles per shard, generously boxed
    latest.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("state").length
      assert(bytes < cap * 32 * 8, s"shard state $bytes bytes — not bounded")
    }
    val latestDf = spark.createDataFrame(
      spark.sparkContext.parallelize(latest.toSeq),
      spark.table("skll2").schema)
    val (_, p50, p90) = StreamKll.mergedQuantiles(latestDf, cap, Seq(0.5, 0.9))
      .as[(Long, Double, Double)].head()
    val sorted = data.map(_.x).sorted
    val eps = 3.0 * math.log(n.toDouble / cap) / cap
    Seq((0.5, p50), (0.9, p90)).foreach { case (p, est) =>
      val rank = sorted.count(_ <= est)
      assert(math.abs(rank - n * p) <= eps * n, s"p=$p est=$est rank=$rank")
    }
  }
}
