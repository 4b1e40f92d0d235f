package graft

import org.apache.spark.sql.functions._
import graft.functions.HllSketch

/** Native hash60 kernel: bit-parity with the compositional
  * conv(substr(md5)) spelling the DuckDB oracles replay, with the JVM
  * state-store twin, and null/unicode edges. */
class Hash60Spec extends SparkSpec {
  import spark.implicits._

  HllSketch.register(spark)

  private def compositional(key: org.apache.spark.sql.Column, tag: String) =
    conv(substring(md5(concat(lit(s"hll-$tag"), key)), 1, 15), 16, 10)
      .cast("long")

  test("native hash60 == conv(substr(md5)) on ascii, unicode, empty keys") {
    val keys = Seq("", "a", "key-123", "ünïcødé-⚓", "ctl",
      "𝕊upplementary-𠜎", "trailing space ", "a" * 500) ++
      (0 until 2000).map(i => s"k-$i")
    val df = keys.toDF("k")
    val rows = df.select(HllSketch.hash60(col("k"), "spec").as("nat"),
      compositional(col("k"), "spec").as("cmp")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native ${r.getLong(0)} != compositional ${r.getLong(1)}"))
  }

  test("empty tag matches too") {
    val df = Seq("x", "y", "⚡").toDF("k")
    val rows = df.select(HllSketch.hash60(col("k")).as("nat"),
      compositional(col("k"), "").as("cmp")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null key evaluates to null, as concat-md5 did") {
    val df = Seq(Some("x"), None).toDF("k")
    val rows = df.select(HllSketch.hash60(col("k"), "t").as("h")).collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  test("JVM twin hash60Jvm stays bit-identical to the column kernel") {
    val keys = Seq("a", "ünïcødé", "k-42", "")
    val fromCol = keys.toDF("k")
      .select(col("k"), HllSketch.hash60(col("k"), "tw").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(HllSketch.hash60Jvm(k, "tw") == fromCol(k), s"twin drift on '$k'")
    }
  }

  test("non-string keys cast to string first (the oracle's CAST spelling)") {
    val df = Seq(1L, 42L).toDF("k")
    val rows = df.select(HllSketch.hash60(col("k"), "n").as("nat"),
      compositional(col("k").cast("string"), "n").as("cmp")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
