package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomBits

class BloomBitsSpec extends SparkSpec {
  import spark.implicits._

  private val M = 4096
  private val K = 3

  private def bitsOf(keys: Seq[String]): (Array[Long], org.apache.spark.sql.DataFrame) = {
    BloomBits.register(spark)
    val df = keys.toDF("key")
      .select(explode(BloomBits.positions(col("key"), K, M, "t")).as("pos"))
      .agg(expr(s"bloom_bits(pos, $M)").as("bits"))
    (df.collect().head.getSeq[Long](0).toArray, df)
  }

  /** Driver-side reference positions: same md5 double hashing. */
  private def refPositions(key: String): Seq[Long] = {
    def h(tag: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag$key".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString.take(7), 16) % M
    }
    val (h1, h2) = (h("bf1-t"), h("bf2-t"))
    (0 until K).map(i => (h1 + i * h2) % M)
  }

  private def refContains(bits: Array[Long], key: String): Boolean =
    refPositions(key).forall(p => (bits((p >> 6).toInt) & (1L << (p & 63))) != 0)

  test("bitset matches the reference bit-for-bit and has fixed size") {
    val keys = (0 until 500).map(i => s"key-$i")
    val (bits, _) = bitsOf(keys)
    assert(bits.length == M / 64)
    val ref = new Array[Long](M / 64)
    keys.flatMap(refPositions).foreach(p => ref((p >> 6).toInt) |= (1L << (p & 63)))
    assert(bits.toSeq == ref.toSeq)
  }

  test("no false negatives; false positives measured, not hidden") {
    val landed = (0 until 800).map(i => s"doc-$i")
    val (bits, bitsDf) = bitsOf(landed)
    val probeKeys = landed.take(200) ++ (0 until 400).map(i => s"other-$i")
    val probe = probeKeys.toDF("key")
      .withColumn("pos_arr", BloomBits.positions(col("key"), K, M, "t"))
      .crossJoin(broadcast(bitsDf))
      .withColumn("maybe", BloomBits.mightContain("bits", "pos_arr"))
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("maybe")).toMap
    // every landed key probes positive
    landed.take(200).foreach(k => assert(probe(k), s"false negative on $k"))
    // engine verdicts equal the reference bit test, including the FPs
    probeKeys.foreach(k => assert(probe(k) == refContains(bits, k)))
    // at this load (800*3/4096) some non-landed keys must collide AND
    // most must not — both behaviors are exercised, not vacuous
    val fps = (0 until 400).count(i => probe(s"other-$i"))
    assert(fps > 0 && fps < 400)
  }

  test("bitset is invariant under input partitioning (map-side partials merge)") {
    BloomBits.register(spark)
    val keys = (0 until 300).map(i => s"p-$i")
    def agg(parts: Int): Seq[Long] =
      keys.toDF("key").repartition(parts)
        .select(explode(BloomBits.positions(col("key"), K, M, "t")).as("pos"))
        .agg(expr(s"bloom_bits(pos, $M)").as("bits"))
        .collect().head.getSeq[Long](0)
    assert(agg(1) == agg(17))
  }

  test("out-of-range and null positions are ignored, not fatal") {
    BloomBits.register(spark)
    val df = Seq(Some(5L), None, Some(-1L), Some(M.toLong + 3), Some(70L))
      .toDF("pos")
      .agg(expr(s"bloom_bits(pos, $M)").as("bits"))
    val bits = df.collect().head.getSeq[Long](0)
    assert(bits(0) == (1L << 5))
    assert(bits(1) == (1L << 6)) // 70 = 64 + 6
    assert(bits.count(_ != 0L) == 2)
  }
}
