package graft

import graft.text.TextFunctions._
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("language ID: marker argmax with deterministic tie-break; no hits → und") {
    val df = Seq(
      "the cat and the dog of it",       // en
      "el perro de la casa que ladra",   // es
      "der hund und die katze nicht",    // de
      "xyzzy plugh quux",                // no markers -> und
      "de la the a"                      // tie en(2)/es(2) -> first lang code wins
    ).toDF("text").select(predictLang(wsTokens($"text")).as("p"))
    assert(df.as[String].collect().toSeq == Seq("en", "es", "de", "und", "en"))
  }

  test("quality score stays in [0,1] and ranks garbage below prose") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs to the hills",
      "0 1 2 3 4 5 6 7 8 9 0 1 2 3"
    ).toDF("text")
      .select(qualityScore($"text", wsTokens($"text")).as("s"))
    val Seq(prose, digits) = df.as[Double].collect().toSeq
    assert(prose > digits)
    assert(prose >= 0.0 && prose <= 1.0 && digits >= 0.0 && digits <= 1.0)
  }

  test("bpeish tokens: letter runs, digit runs, single punctuation") {
    val df = Seq("ab12,cd!").toDF("text").select(bpeishCount($"text").as("n"))
    assert(df.as[Long].head() == 5L) // ab | 12 | , | cd | !
  }

  test("shingles: short docs yield empty arrays, duplicates deduped") {
    val df = Seq("a b", "x y x y x y").toDF("text")
      .select(shingles(wsTokens($"text"), 3).as("sh"))
    val got = df.as[Seq[String]].collect()
    assert(got(0).isEmpty)                       // 2 tokens < k=3
    assert(got(1).toSet == Set("x y x", "y x y")) // distinct only
  }

  test("fingerprint normalizes case and whitespace runs") {
    val df = Seq(("Hello   World", "hello world"), ("a  b", "a b\n"))
      .toDF("t1", "t2")
      .select((fingerprint($"t1") === fingerprint($"t2")).as("eq"))
    assert(df.as[Boolean].collect().forall(identity))
  }

  test("approx MAD path tracks the exact bounds closely") {
    val df = graft.core.Tables.lineitem(spark, sf)
      .select($"l_returnflag".as("g"), $"l_extendedprice".as("x"))
    def bounds(exact: Boolean) =
      graft.stats.Outliers.madBoundsLog1p(df, Seq("g"), "x", 2.5, exact)
        .collect().map(r => r.getAs[String]("g") ->
          (r.getAs[Double]("lower"), r.getAs[Double]("upper"))).toMap
    val (e, a) = (bounds(true), bounds(false))
    e.keys.foreach { g =>
      assert(math.abs(e(g)._1 - a(g)._1) / e(g)._1 < 0.05, s"lower diverged for $g")
      assert(math.abs(e(g)._2 - a(g)._2) / e(g)._2 < 0.05, s"upper diverged for $g")
    }
  }
}
