package graft

import org.apache.spark.sql.functions._
import graft.functions.HllSketch

/** HyperLogLog register aggregate: register parity with the
  * compositional groupBy-max spelling, merge correctness across
  * partitionings, estimate accuracy within the theoretical error
  * bound, and the linear-counting small-range branch. */
@org.scalatest.tags.Slow
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private val P = 9
  private val M = 1 << P

  private def estimateOf(keys: Seq[String], parts: Int): (Double, Long, Long) = {
    HllSketch.register(spark)
    val df = keys.toDF("k").repartition(parts)
      .select(HllSketch.hash60(col("k"), "spec").as("h"))
      .agg(expr(s"hll_registers(h, $P)").as("regs"))
      .select(HllSketch.zerosCol(col("regs")).as("zeros"),
        HllSketch.sumExpS52Col(col("regs")).as("s52"))
      .withColumn("est", HllSketch.estimateCol(col("zeros"), col("s52"), P))
      .collect()(0)
    (df.getAs[Double]("est"), df.getAs[Long]("zeros"), df.getAs[Long]("s52"))
  }

  test("registers match the compositional groupBy-max spelling") {
    HllSketch.register(spark)
    val keys = (0 until 5000).map(i => s"key-$i")
    val hashed = keys.toDF("k")
      .select(HllSketch.hash60(col("k"), "spec").as("h"))
    val native = hashed.agg(expr(s"hll_registers(h, $P)"))
      .collect()(0).getSeq[Int](0)
    val wBits = 60 - P
    val composed = hashed
      .select(shiftright(col("h"), wBits).as("bucket"),
        (col("h") % (1L << wBits)).as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - length(conv(col("w"), 10, 2))))
      .groupBy("bucket").agg(max("rho").as("reg"))
      .collect().map(r => r.getAs[Long]("bucket").toInt -> r.getAs[Int]("reg"))
      .toMap
    (0 until M).foreach { b =>
      assert(native(b) == composed.getOrElse(b, 0),
        s"register $b: native ${native(b)} vs composed ${composed.getOrElse(b, 0)}")
    }
  }

  test("merge across partitionings is exact: 1 partition == 16 partitions") {
    val keys = (0 until 20000).map(i => s"u-${i % 7321}")
    assert(estimateOf(keys, 1) == estimateOf(keys, 16),
      "registers (and so the estimate) must not depend on partitioning")
  }

  test("estimate within 4 standard errors of the true cardinality") {
    val n = 50000
    val keys = (0 until n).map(i => s"item-$i")
    val (est, _, _) = estimateOf(keys, 8)
    val se = 1.04 / math.sqrt(M.toDouble) // ~4.6% at p=9
    assert(math.abs(est - n) / n < 4 * se,
      s"estimate $est too far from $n (rel ${math.abs(est - n) / n})")
  }

  test("small-range branch: low cardinality routes through linear counting") {
    val keys = (0 until 30).map(i => s"rare-$i")
    val (est, zeros, _) = estimateOf(keys, 4)
    assert(zeros > 0 && zeros <= M - 1)
    // linear counting: m * ln(m / zeros) — exact for distinct buckets
    val expected = M.toDouble * math.log(M.toDouble / zeros)
    assert(est == expected, s"est $est != linear-counting $expected")
    assert(math.abs(est - 30) < 5, s"linear counting way off: $est vs 30")
  }

  test("duplicates do not move the registers") {
    val once = (0 until 3000).map(i => s"d-$i")
    val many = Seq.fill(5)(once).flatten
    assert(estimateOf(once, 4) == estimateOf(many, 8))
  }

  test("hll_merge of per-group registers == direct build over the union") {
    HllSketch.register(spark)
    val rows = (0 until 8000).map(i => (s"g${i % 3}", s"k-${i % 2111}"))
    val df = rows.toDF("g", "k")
      .select(col("g"), HllSketch.hash60(col("k"), "spec").as("h"))
    val fine = df.groupBy("g").agg(expr(s"hll_registers(h, $P)").as("regs"))
    val merged = fine.agg(expr(s"hll_merge(regs, $P)"))
      .collect()(0).getSeq[Int](0)
    val direct = df.agg(expr(s"hll_registers(h, $P)"))
      .collect()(0).getSeq[Int](0)
    assert(merged == direct,
      "max-merge of group registers must equal the union's registers")
  }

  test("hll_merge is idempotent: re-merging the merged vector is a no-op") {
    HllSketch.register(spark)
    val df = (0 until 2000).map(i => s"x-$i").toDF("k")
      .select(HllSketch.hash60(col("k"), "spec").as("h"))
    val regs = df.agg(expr(s"hll_registers(h, $P)").as("regs"))
    val twice = regs.unionByName(regs)
      .agg(expr(s"hll_merge(regs, $P)")).collect()(0).getSeq[Int](0)
    val once = regs.collect()(0).getSeq[Int](0)
    assert(twice == once)
  }

  test("hll_registers_multi == k independent hll_registers, nulls skipped per slot") {
    HllSketch.register(spark)
    val rows = (0 until 6000).map { i =>
      (s"a-${i % 997}",
        if (i % 7 == 0) null else s"b-${i % 313}",
        (i % 41).toString)
    }
    val df = rows.toDF("a", "b", "c").repartition(8)
    val hashed = df.select(
      array(HllSketch.hash60(col("a"), "a"), HllSketch.hash60(col("b"), "b"),
        HllSketch.hash60(col("c"), "c")).as("hs"),
      HllSketch.hash60(col("a"), "a").as("ha"),
      HllSketch.hash60(col("b"), "b").as("hb"),
      HllSketch.hash60(col("c"), "c").as("hc"))
    val multi = hashed.agg(expr(s"hll_registers_multi(hs, $P, 3)"))
      .collect()(0).getSeq[scala.collection.Seq[Int]](0)
    val singles = hashed.agg(
        expr(s"hll_registers(ha, $P)"), expr(s"hll_registers(hb, $P)"),
        expr(s"hll_registers(hc, $P)")).collect()(0)
    (0 until 3).foreach { i =>
      assert(multi(i).toSeq == singles.getSeq[Int](i).toSeq,
        s"slot $i registers diverge from the per-column aggregate")
    }
  }

  test("hll_registers_multi is partitioning-invariant") {
    HllSketch.register(spark)
    def regs(parts: Int) = (0 until 5000).map(i => (s"p-${i % 511}", s"q-$i"))
      .toDF("a", "b").repartition(parts)
      .select(array(HllSketch.hash60(col("a"), "a"),
        HllSketch.hash60(col("b"), "b")).as("hs"))
      .agg(expr(s"hll_registers_multi(hs, $P, 2)"))
      .collect()(0).getSeq[scala.collection.Seq[Int]](0).map(_.toSeq)
    assert(regs(1) == regs(16))
  }

  test("hll_merge rejects a register vector of the wrong precision") {
    HllSketch.register(spark)
    val bad = Seq(Seq.fill(16)(1)).toDF("regs") // 16 entries, not 2^9
    val e = intercept[Exception] {
      bad.agg(expr(s"hll_merge(regs, $P)")).collect()
    }
    assert(e.getMessage != null)
  }
}
