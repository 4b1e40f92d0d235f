package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition-based document quality filters for pretraining pipelines
  * (builder mandate; the within-document analogues of the cross-corpus
  * dedup suite — the family of signals "Scaling Language Models"-style
  * data curation uses to drop degenerate pages): repeated n-grams and
  * low token diversity flag boilerplate, keyword stuffing and
  * generation loops that exact/near dedup cannot see because the
  * repetition is INSIDE one document.
  *
  * All statistics are exact token-level ratios: engine-portable (plain
  * counts, no RNG, no floats beyond final divisions), so the q96 oracle
  * hash-matches. Work scales as one explode of token n-grams with
  * map-side combine — two shuffles per statistic family, nothing
  * quadratic, no driver loops.
  */
object QualityFilters {

  /** Per-document repetition statistics:
    *  - `n_tokens`, `distinct_token_ratio` (distinct/total; null for
    *    empty docs),
    *  - `top_ngram_frac`: occurrences of the most frequent `topN`-gram
    *    over all `topN`-gram occurrences (null when the doc is shorter
    *    than `topN` tokens),
    *  - `dup_ngram_frac`: fraction of `dupN`-gram occurrences whose
    *    gram occurs more than once (null when shorter than `dupN`).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      topN: Int = 2, dupN: Int = 3): DataFrame = {
    // The n-gram arrays are built UNDER an explode (Generate) boundary,
    // never in a plain projection chain: CollapseProject would otherwise
    // substitute the tokenizer INTO every element_at reference of the
    // gram lambda and re-split the text O(grams) times per document
    // (measured: 26 s of single-task tokenization at sf0.1 vs ~1 s with
    // the Generate boundary keeping the token array materialized).
    val base = graft.core.Widen.widen(df)
      .select(col(idCol).as("doc"), TextFunctions.wsTokens(col(textCol)).as("__t"))
    val tokStats = base.select(col("doc"),
      size(col("__t")).cast("long").as("n_tokens"),
      when(size(col("__t")) > 0,
        size(array_distinct(col("__t"))).cast("double") /
          size(col("__t")).cast("double")).as("distinct_token_ratio"))
    def gramCounts(n: Int) =
      base.select(col("doc"), explode(TextFunctions.ngrams(col("__t"), n)).as("g"))
        .groupBy(col("doc"), col("g")).agg(count(lit(1)).as("c"))
    val top = gramCounts(topN)
      .groupBy(col("doc"))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double"))
        .as("top_ngram_frac"))
    val dup = gramCounts(dupN)
      .groupBy(col("doc"))
      .agg((sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).cast("double") /
        sum(col("c")).cast("double")).as("dup_ngram_frac"))
    tokStats
      .join(top, Seq("doc"), "left")
      .join(dup, Seq("doc"), "left")
  }

  /** Blocklist term tagging — the word-level exclusion filter of every
    * crawl-curation recipe (CCNet/RefinedWeb badwords pass): per
    * document, the number of DISTINCT blocklist terms present
    * (`n_block_terms`) and the total flagged-token occurrence count
    * (`n_block_hits`). Per-row codegen'd array primitives
    * (`array_intersect` / `filter` against the literal term array) —
    * no explode, no join, no UDF: the blocklist rides the plan as a
    * literal, so the filter is a map-side projection at any scale.
    * Matching is exact-token on the engine's whitespace tokenization;
    * callers lowercase upstream if the list is case-insensitive. */
  def blocklistTag(df: DataFrame, textCol: String,
                   terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    val list = array(terms.distinct.map(lit): _*)
    val toks = TextFunctions.wsTokens(col(textCol))
    df.withColumn("n_block_terms",
        size(array_intersect(array_distinct(toks), list)).cast("long"))
      .withColumn("n_block_hits",
        size(filter(toks, t => array_contains(list, t))).cast("long"))
  }
}
