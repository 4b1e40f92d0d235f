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

  test("GopherRules: each rule fires on its designed failure; good doc keeps") {
    import graft.text.GopherRules
    val good = (("the be to of and that have " * 10) + ("word " * 30)).trim
    val docs = Seq(
      (0L, good),                                      // passes all seven
      (1L, "too short"),                               // word count
      (2L, ("abcdefghijklmnopqrst " * 60).trim),       // mean word length > 10
      (3L, ("123 456 789 " * 30).trim),                // alphabetic fraction
      (4L, ("- bullet\n" * 20) + good),                // bullet lines
      (5L, ("ends here...\n" * 20) + good),            // ellipsis lines
      (6L, ("# " * 80) + good),                        // symbol ratio
      (7L, ("plain word list " * 40).trim))            // required stopwords
      .toDF("doc_id", "text")
    val out = GopherRules.flags(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Boolean]("keep"), "good doc must pass all rules")
    assert(!out(1L).getAs[Boolean]("r_word_count"))
    assert(!out(2L).getAs[Boolean]("r_word_len"))
    assert(!out(3L).getAs[Boolean]("r_alpha_words"))
    assert(!out(4L).getAs[Boolean]("r_bullet_lines"))
    assert(!out(5L).getAs[Boolean]("r_ellipsis_lines"))
    assert(!out(6L).getAs[Boolean]("r_symbol_ratio"))
    assert(!out(7L).getAs[Boolean]("r_stopwords"))
    for (id <- 1L to 7L) assert(!out(id).getAs[Boolean]("keep"))
    // the whole bundle is a projection: no shuffle, no join, no explode
    val plan = GopherRules.flags(docs, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"rule bundle must stay map-only:\n$plan")
    assert(GopherRules.filterDocs(docs, "text").count() == 1)
  }
}
