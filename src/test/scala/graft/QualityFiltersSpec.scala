package graft

import graft.text.QualityFilters

/** Within-document repetition statistics: hand-computed ratios, null
  * semantics for too-short documents. */
class QualityFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: exact ratios on hand-computed docs") {
    val docs = Seq(
      (1L, "a b a b a b"), // 6 tokens, 2 distinct; bigrams: "a b"x3,"b a"x2; trigrams: "a b a"x2,"b a b"x2
      (2L, "x y z"),       // all distinct; top bigram 1/2; no duplicated trigram
      (3L, "q"))           // 1 token: no bigrams/trigrams -> null fracs
      .toDF("doc_id", "text")
    val st = QualityFilters.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc") -> r).toMap

    val d1 = st(1L)
    assert(d1.getAs[Long]("n_tokens") == 6L)
    assert(math.abs(d1.getAs[Double]("distinct_token_ratio") - 2.0 / 6.0) < 1e-12)
    assert(math.abs(d1.getAs[Double]("top_ngram_frac") - 3.0 / 5.0) < 1e-12)
    assert(math.abs(d1.getAs[Double]("dup_ngram_frac") - 1.0) < 1e-12)

    val d2 = st(2L)
    assert(math.abs(d2.getAs[Double]("distinct_token_ratio") - 1.0) < 1e-12)
    assert(math.abs(d2.getAs[Double]("top_ngram_frac") - 0.5) < 1e-12)
    assert(d2.getAs[Double]("dup_ngram_frac") == 0.0)

    val d3 = st(3L)
    assert(d3.getAs[Long]("n_tokens") == 1L)
    assert(d3.isNullAt(d3.fieldIndex("top_ngram_frac")))
    assert(d3.isNullAt(d3.fieldIndex("dup_ngram_frac")))
  }

  test("blocklistTag: distinct-term vs occurrence counts; clean docs zero; no join in the plan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "bad bad ugly fine"), // 2 distinct terms, 3 occurrences
      (2L, "fine text only"),
      (3L, "")).toDF("doc_id", "text")
    val tagged = QualityFilters.blocklistTag(docs, "text", Seq("bad", "ugly", "absent"))
    val rows = tagged.select("doc_id", "n_block_terms", "n_block_hits")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(rows(1L) == ((1L, 2L, 3L)))
    assert(rows(2L) == ((2L, 0L, 0L)))
    assert(rows(3L) == ((3L, 0L, 0L)))
    val plan = tagged.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Generate"),
      s"blocklist must ride the plan as a literal projection:\n$plan")
  }
}
