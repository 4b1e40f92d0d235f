package graft

import graft.functions.DeflateLen
import org.apache.spark.sql.functions._

class DeflateRatioSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(texts: (Long, String)*): Map[Long, Double] = {
    DeflateLen.register(spark)
    texts.toDF("id", "text")
      .select($"id", (expr("deflate_len(text)").cast("double") /
        octet_length($"text").cast("double")).as("r"))
      .as[(Long, Double)].collect().toMap
  }

  test("templated text compresses far below natural text, noise above it") {
    val templated = "click here to buy now! " * 200
    val natural = ("the quick brown fox jumps over the lazy dog and then " +
      "wanders through seventeen distinct meadows describing each in turn with " +
      "unrepeated vocabulary chosen from a moderately large working lexicon ") * 3
    // md5-hex chained from a seed: deterministic high-entropy "noise"
    val noise = Iterator.iterate("seed")(s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).drop(1).take(120).mkString
    val r = ratios(1L -> templated, 2L -> natural, 3L -> noise)
    assert(r(1L) < 0.1, s"templated ratio ${r(1L)} not tiny")
    assert(r(1L) < r(2L) && r(2L) < r(3L),
      s"ordering violated: ${r(1L)} / ${r(2L)} / ${r(3L)}")
    assert(r(3L) > 0.5, s"noise ratio ${r(3L)} suspiciously compressible")
  }

  test("deflate_len is deterministic, null-safe, and partitioning-invariant") {
    DeflateLen.register(spark)
    val df = Seq((1L, "abc " * 50), (2L, null: String), (3L, ""))
      .toDF("id", "text")
    val a = df.repartition(1).select($"id", expr("deflate_len(text)").as("n"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val b = df.repartition(5).select($"id", expr("deflate_len(text)").as("n"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(a == b)
    assert(a.exists { case (2L, v) => v == -1L; case _ => false }, "null must stay null")
    val empty = a.collectFirst { case (3L, v) => v }.get
    assert(empty >= 0L, "empty string must deflate to a small non-null length")
  }

  test("the expression stays inside whole-stage codegen") {
    DeflateLen.register(spark)
    // a file-backed scan — a local relation would constant-fold the
    // whole projection driver-side and show no codegen at all
    val plan = graft.core.Tables.documents(spark, sf)
      .select(expr("deflate_len(text)")).queryExecution.executedPlan.toString
    // the starred operators are the ones inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [deflate_len"), plan)
  }
}
