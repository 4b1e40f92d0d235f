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
}
