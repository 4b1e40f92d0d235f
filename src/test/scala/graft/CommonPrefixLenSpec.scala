package graft

import org.apache.spark.sql.functions._

/** common_prefix_len kernel: code-point counting (incl. supplementary
  * plane), substr alignment, null safety, codegen registration. */
class CommonPrefixLenSpec extends SparkSpec {
  import spark.implicits._

  private def lcp(a: String, b: String): Int =
    Seq((a, b)).toDF("a", "b")
      .select(call_function("common_prefix_len", col("a"), col("b")).as("l"))
      .collect()(0).getInt(0)

  test("basic prefixes") {
    assert(lcp("banana", "bandana") == 3)
    assert(lcp("abc", "abc") == 3)
    assert(lcp("abc", "xbc") == 0)
    assert(lcp("", "abc") == 0)
    assert(lcp("abc", "") == 0)
  }

  test("counts code points, not UTF-16 units; aligns with substring") {
    val emoji = new String(Character.toChars(0x1F600)) // 2 code units
    assert(lcp(emoji + "ab", emoji + "ax") == 2)
    // a supplementary char vs a different one: no shared prefix
    val other = new String(Character.toChars(0x1F601))
    assert(lcp(emoji + "ab", other + "ab") == 0)
    // substr by the returned length IS the shared prefix
    val l = lcp(emoji + "abc", emoji + "abd")
    val got = Seq(emoji + "abc").toDF("s")
      .select(expr(s"substring(s, 1, $l)")).collect()(0).getString(0)
    assert(got == emoji + "ab")
  }

  test("null-safe") {
    val out = Seq((Option("a"), Option.empty[String]))
      .toDF("a", "b")
      .select(call_function("common_prefix_len", col("a"), col("b")).as("l"))
      .collect()(0)
    assert(out.isNullAt(0))
  }
}
