package graft

import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Native word_ngrams must replicate the compositional
  * transform(sequence) + concat_ws (+ array_distinct) spelling
  * bit-for-bit — every dedup/overlap oracle replays that spelling. */
class WordNgramsSpec extends SparkSpec {
  import spark.implicits._

  private def legacy(tokens: org.apache.spark.sql.Column, k: Int,
                     distinct: Boolean) = {
    val n = size(tokens)
    val grams = transform(sequence(lit(1), n - (k - 1)), i =>
      concat_ws(" ", (0 until k).map(j => element_at(tokens, i + lit(j))): _*))
    when(n >= k, if (distinct) array_distinct(grams) else grams)
      .otherwise(array().cast("array<string>"))
  }

  test("parity with the compositional spelling on real documents") {
    val docs = graft.core.Tables.documents(spark, sf).limit(200)
      .select(TextFunctions.wsTokens($"text").as("t"))
    Seq(2, 5).foreach { k =>
      Seq(true, false).foreach { d =>
        val fn = if (d) TextFunctions.shingles(_, k) else TextFunctions.ngrams(_, k)
        val rows = docs.select(fn($"t").as("n"), legacy($"t", k, d).as("o"))
          .as[(Seq[String], Seq[String])].collect()
        assert(rows.nonEmpty && rows.forall { case (n, o) => n == o },
          s"k=$k distinct=$d diverged")
      }
    }
  }

  test("edges: short docs, duplicates, null tokens array, null elements") {
    val df = Seq(
      (1L, Some(Seq("a", "b", "c", "a", "b", "c"))), // duplicate shingles
      (2L, Some(Seq("x"))),                          // shorter than k
      (3L, Some(Seq.empty[String])),                 // empty
      (4L, None)                                     // null array
    ).toDF("id", "t")
    val got = df.select($"id", TextFunctions.shingles($"t", 2).as("s"),
        TextFunctions.ngrams($"t", 2).as("g"))
      .as[(Long, Seq[String], Seq[String])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == Seq("a b", "b c", "c a")) // distinct, first-occurrence order
    assert(got(1L)._2 == Seq("a b", "b c", "c a", "a b", "b c")) // with multiplicity
    assert(got(2L)._1.isEmpty && got(3L)._1.isEmpty && got(4L)._1.isEmpty)
    // null ELEMENT: concat_ws skips it, no separator left behind
    val withNull = Seq(Tuple1(Seq(Some("a"), None, Some("c")).map(_.orNull)))
      .toDF("t")
    val nn = withNull.select(TextFunctions.ngrams($"t", 2).as("g"),
        legacy($"t", 2, distinct = false).as("o"))
      .as[(Seq[String], Seq[String])].head()
    assert(nn._1 == nn._2 && nn._1 == Seq("a", "c"))
  }

  test("plans the native expression, no lambda in the scan") {
    val df = spark.range(3).select(array(col("id").cast("string"),
      lit("w"), lit("w")).as("t"))
    val sel = df.select(TextFunctions.shingles($"t", 2).as("s"))
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("word_ngrams"), s"native expression missing:\n$plan")
    assert(!plan.contains("transform("), s"lambda path leaked:\n$plan")
    assert(sel.as[Seq[String]].collect().forall(_.length == 2))
  }
}
