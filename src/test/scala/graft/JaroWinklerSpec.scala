package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.JaroWinkler

/** Jaro-Winkler: bit-equality with DuckDB's jaro_winkler_similarity on
  * the reference triples (the oracle-parity contract), boost-threshold
  * edges, and eval≡codegen parity through the registered function. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("bit-equal to the DuckDB reference values") {
    // literals captured from DuckDB jaro_winkler_similarity
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
    assert(jw("AB", "ABCDEFGH") == 0.8)
    assert(jw("ab", "abcdefghijklmnop") == 0.7666666666666667)
    assert(jw("ABCDEF", "ABBBBB") == 0.5555555555555555) // jaro <= 0.7: no boost
  }

  test("identity, empty and disjoint edges") {
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no matches
  }

  test("registered function: codegen result equals interpreted eval") {
    JaroWinkler.register(spark)
    val pairs = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
      ("small ring", "small rings"), ("red widget", "blue widget"),
      ("", ""), ("x", "x"))
    val df = pairs.toDF("a", "b")
    val fromSql = df.selectExpr("jaro_winkler(a, b) AS s")
      .collect().map(_.getDouble(0)).toSeq
    val direct = pairs.map { case (a, b) => jw(a, b) }
    assert(fromSql == direct)
  }
}
