package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal, CCNet-style generalized to token
  * n-grams: an n-gram that occurs in more than `maxDfPct` percent of
  * the distinct documents of its scope (source/domain) is boilerplate —
  * site chrome, licence footers, navigation text — and every token
  * position it covers is dropped from every document. The cleaned text
  * is reassembled from the surviving tokens in order.
  *
  * The threshold is a FRACTION of the scope's document count, not an
  * absolute count: an absolute cutoff silently reclassifies the whole
  * corpus as boilerplate when the corpus grows (10× the documents ⇒
  * 10× every gram's df), while a fraction pins "rare" to the same
  * meaning at every scale. The comparison is integer cross-multiplied
  * (`df · 100 > n_docs · maxDfPct`) — no float thresholds to diverge
  * between engines.
  *
  * Scale shape: document frequency is one exact (scope, gram) →
  * count-distinct aggregation (shuffle keyed on the gram, map-side
  * combined); the boilerplate gram set it yields is by construction
  * tiny (high-df grams are rare), so the mask-back join is a BROADCAST
  * hash join against the full occurrence list — the corpus-sized side
  * never reshuffles on the gram. Position masking and reassembly are
  * per-document (`id`-keyed) operations. No step is quadratic in the
  * corpus and nothing corpus-sized is collected or broadcast.
  */
object Boilerplate {

  /** Per-document report: `idCol`, `n_tokens` (original whitespace
    * token count), `n_removed` (positions covered by some boilerplate
    * n-gram occurrence), and `cleaned` (surviving tokens re-joined by
    * single spaces; empty string when everything was boilerplate).
    * Documents shorter than `n` tokens carry no n-gram and pass
    * through unchanged. `docs` is one row per document.
    *
    * The full token stream is never exploded through a shuffle: only
    * boilerplate OCCURRENCES (rare by construction) shuffle, into one
    * per-document sorted position mask, and the mask joins back to the
    * intact documents where masking and reassembly are per-row array
    * expressions inside codegen. */
  def removeRepeatedNgrams(docs: DataFrame, idCol: String, scopeCol: String,
                           textCol: String, n: Int, maxDfPct: Int): DataFrame = {
    // materialize the token array first — element_at inside the n-gram
    // lambda would otherwise re-evaluate split() per referenced element
    // — and widen: tokenize+ngram is the CPU-dense stage and a one-file
    // corpus would otherwise run it on a single task (same two lessons
    // as Dedup.shingleIndex).
    val wide = graft.core.Widen.widen(docs)
    val grams = wide
      .select(col(idCol).as("__id"), col(scopeCol).as("__scope"),
        TextFunctions.wsTokens(col(textCol)).as("__ws"))
      .select(col("__id"), col("__scope"),
        posexplode(TextFunctions.ngrams(col("__ws"), n)).as(Seq("start", "gram")))
    val scopeN = wide.groupBy(col(scopeCol).as("__scope"))
      .agg(count(lit(1)).as("__n_docs"))
    val boil = grams.groupBy(col("__scope"), col("gram"))
      .agg(countDistinct(col("__id")).as("gram_df"))
      .join(broadcast(scopeN), Seq("__scope"))
      .filter(col("gram_df") * 100 > col("__n_docs") * maxDfPct)
      .select(col("__scope"), col("gram"))
    // covered token positions per document: each boilerplate occurrence
    // masks start..start+n-1; collect_set dedups overlapping occurrences
    val masks = grams.join(broadcast(boil), Seq("__scope", "gram"))
      .select(col("__id"),
        explode(sequence(col("start"), col("start") + lit(n - 1))).as("pos"))
      .groupBy(col("__id"))
      .agg(array_sort(collect_set(col("pos"))).as("__mask"))
    wide.select(col(idCol), TextFunctions.wsTokens(col(textCol)).as("__toks"))
      .join(masks, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        coalesce(size(col("__mask")), lit(0)).cast("long").as("n_removed"),
        concat_ws(" ",
          filter(col("__toks"), (_, i) =>
            not(array_contains(coalesce(col("__mask"), array().cast("array<int>")), i))))
          .as("cleaned"))
  }
}
