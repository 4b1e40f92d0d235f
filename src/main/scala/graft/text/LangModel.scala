package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Exact

/** N-gram language-model quality scoring — the classic training-data
  * filter (builder mandate: text analysis): documents are scored by
  * their mean add-one-smoothed bigram log-probability under a model
  * counted from a reference corpus; low scores mark gibberish,
  * boilerplate and wrong-language text.
  *
  * Everything is counts + joins + one `ln` per bigram — fully
  * distributed: the model tables shuffle on their word keys (AQE skew
  * join handles Zipf-hot words, `core/GraftSession`), the vocabulary
  * size is a broadcast scalar, and the per-doc mean rides the
  * scaled-long exact path so scores are bit-reproducible at any
  * parallelism.
  */
object LangModel {

  /** (doc, w1, w2) with multiplicity — consecutive whitespace-token
    * pairs (no distinct: counts are the model). Pairs come from the
    * native 2-gram kernel ([[graft.text.WordNgrams]]) and split on the
    * join space — whitespace tokens cannot contain one, so the split
    * is unambiguous; the struct-building transform lambda this
    * replaces ran interpreted per token position. */
  def bigramPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"), TextFunctions.wsTokens(col(textCol)).as("__ws"))
      .select(col("doc"),
        explode(TextFunctions.ngrams(col("__ws"), 2)).as("bg"))
      .select(col("doc"), substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))

  /** The corpus model: bigram counts, unigram (context) counts, and
    * the vocabulary size as a one-row frame (kept distributed — no
    * driver-side collect). */
  final case class BigramModel(bigrams: DataFrame, unigrams: DataFrame,
                               vocab: DataFrame)

  def train(corpus: DataFrame, idCol: String, textCol: String): BigramModel = {
    val toks = corpus.select(explode(TextFunctions.wsTokens(col(textCol))).as("w"))
    BigramModel(
      bigramPairs(corpus, idCol, textCol)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2")),
      toks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
        .withColumnRenamed("w", "w1"),
      toks.agg(countDistinct(col("w")).as("v")))
  }

  /** Interpolated Kneser–Ney bigram model (Kneser & Ney 1995; the
    * smoothing Chen & Goodman 1998 found best across corpora — the
    * LM behind production CCNet-style perplexity filters, where
    * add-one's oversmoothing washes out the head of the distribution).
    * All components are integer censuses off ONE bigram-type frame:
    *   - `bigrams`  (w1, w2, c2): bigram token counts
    *   - `contexts` (w1, c1 = Σ_w2 c2, n1p_left = |{w2 : c2>0}|):
    *     context mass + continuation fan-out (c1 from the bigram
    *     frame, not raw unigrams — doc-final tokens have no successor
    *     and must not count as context mass)
    *   - `continuations` (w2, n1p_right = |{w1 : c2>0}|): in how many
    *     distinct contexts w2 appears — the KN continuation count
    *   - `scalars` (b = bigram types, v = vocab), one broadcast row */
  final case class KnModel(bigrams: DataFrame, contexts: DataFrame,
                           continuations: DataFrame, scalars: DataFrame)

  def trainKn(corpus: DataFrame, idCol: String, textCol: String): KnModel = {
    val bg = bigramPairs(corpus, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      // three census consumers below — count once
      .localCheckpoint(eager = false)
    val toks = corpus.select(explode(TextFunctions.wsTokens(col(textCol))).as("w"))
    trainKnCounts(bg, toks.agg(countDistinct(col("w")).as("v")))
  }

  /** [[trainKn]] from a PRE-COUNTED bigram frame (w1, w2, c2) and a
    * one-row vocab frame — callers already maintaining the bigram
    * census for another model (q375 scores the same train slice under
    * add-one AND Kneser–Ney) reuse it instead of re-tokenizing the
    * corpus. The censuses below the count frame are identical to
    * [[trainKn]]'s, so results are bit-identical. */
  def trainKnCounts(bg: DataFrame, vocab: DataFrame): KnModel =
    KnModel(
      bg,
      bg.groupBy(col("w1"))
        .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1p_left")),
      bg.groupBy(col("w2")).agg(count(lit(1)).as("n1p_right")),
      bg.agg(count(lit(1)).as("b")).crossJoin(vocab))

  /** Mean interpolated-KN bigram log-probability per document, with
    * absolute discount D:
    *
    *   Pc(w2)    = (n1p_right(w2) + 1) / (B + V)        — add-one-
    *     smoothed continuation probability, so OOV words keep nonzero
    *     mass (the uniform 1/(B+V) floor)
    *   P(w2|w1)  = (max(c2 − D, 0) + D · n1p_left(w1) · Pc(w2)) / c1
    *     when the context is seen; Pc(w2) on unseen contexts (full
    *     backoff — λ would be 1 with nothing to interpolate against).
    *
    * The discounted mass D · n1p_left(w1) is exactly what the max()
    * subtracts across seen successors, so P sums to 1 over the seen
    * vocabulary (modulo the OOV floor) — the property add-one lacks.
    * Same shuffle shape as [[score]]: three model joins keyed on the
    * Zipf-skewed words (AQE skew-join), scalars broadcast, per-doc
    * mean on the scaled-long exact path. Documents with fewer than
    * two tokens have no bigrams and drop.
    * Output: (doc, n_bigrams, logprob). */
  def scoreKn(docs: DataFrame, model: KnModel, idCol: String,
              textCol: String, discount: Double = 0.75): DataFrame =
    scoreKnPairs(bigramPairs(docs, idCol, textCol), model, discount)

  /** [[scoreKn]] over a PRE-COMPUTED (doc, w1, w2) bigram frame — the
    * [[scorePairs]] twin for the KN model: callers scoring the same
    * documents under several models derive the pairs once, pin them,
    * and pass the frame here. The plan below the pair frame is
    * identical to [[scoreKn]]'s, so results are bit-identical. */
  def scoreKnPairs(pairs: DataFrame, model: KnModel,
                   discount: Double = 0.75): DataFrame = {
    val pc = (coalesce(col("n1p_right"), lit(0L)) + lit(1L)).cast("double") /
      (col("b") + col("v")).cast("double")
    val seen = (greatest(coalesce(col("c2"), lit(0L)).cast("double") - lit(discount),
      lit(0.0)) +
      lit(discount) * coalesce(col("n1p_left"), lit(0L)).cast("double") * pc) /
      col("c1").cast("double")
    val p = when(col("c1").isNotNull && col("c1") > 0, seen).otherwise(pc)
    pairs
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.contexts, Seq("w1"), "left")
      .join(model.continuations, Seq("w2"), "left")
      .crossJoin(broadcast(model.scalars))
      .withColumn("__lp", log(p))
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (Exact.lsumAt(col("__lp"), 1e9) / count(lit(1))).as("logprob"))
  }

  /** Mean add-one bigram log-probability per document:
    * `avg over doc bigrams of ln((c(w1,w2)+1) / (c(w1)+V))` — unseen
    * bigrams and unseen contexts degrade smoothly (`ln(1/V)` floor).
    * Documents with fewer than two tokens have no bigrams and drop.
    * Output: (doc, n_bigrams, logprob). */
  def score(docs: DataFrame, model: BigramModel,
            idCol: String, textCol: String): DataFrame =
    scorePairs(bigramPairs(docs, idCol, textCol), model)

  /** [[score]] over a PRE-COMPUTED (doc, w1, w2) bigram frame —
    * callers scoring the same documents under several models (the
    * ablation pattern: q403 scores held-out text under the full and
    * the filtered model) derive the pairs once, pin them, and pass
    * the frame here instead of re-running tokenizer + n-gram kernel
    * per model. The plan below the pair frame is identical to
    * [[score]]'s, so results are bit-identical. */
  def scorePairs(pairs: DataFrame, model: BigramModel): DataFrame = {
    val lp = log(
      (coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double") /
        (coalesce(col("c1"), lit(0L)) + col("v")).cast("double"))
    pairs
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.unigrams, Seq("w1"), "left")
      .crossJoin(broadcast(model.vocab))
      .withColumn("__lp", lp)
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (Exact.lsumAt(col("__lp"), 1e9) / count(lit(1))).as("logprob"))
  }
}
