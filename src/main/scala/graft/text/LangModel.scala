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

  /** Mean add-one bigram log-probability per document:
    * `avg over doc bigrams of ln((c(w1,w2)+1) / (c(w1)+V))` — unseen
    * bigrams and unseen contexts degrade smoothly (`ln(1/V)` floor).
    * Documents with fewer than two tokens have no bigrams and drop.
    * Output: (doc, n_bigrams, logprob). */
  def score(docs: DataFrame, model: BigramModel,
            idCol: String, textCol: String): DataFrame = {
    val lp = log(
      (coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double") /
        (coalesce(col("c1"), lit(0L)) + col("v")).cast("double"))
    bigramPairs(docs, idCol, textCol)
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
