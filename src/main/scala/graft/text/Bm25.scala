package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over an inverted-index plan — the lookup side
  * of a training-data curation stack (benchmark decontamination by
  * retrieval, targeted corpus audits, "find me the documents that
  * dominate this query" debugging).
  *
  * Plan shape, not an index structure: postings are the exploded
  * (doc, term, tf) frame, the query set is broadcast into the postings
  * join so ONLY postings of query terms survive the first join, and the
  * remaining joins (document frequency on term, document length on doc)
  * touch frames already reduced to those postings. Nothing is ever
  * all-pairs; corpus-sized frames are shuffled at most once each. Top-k
  * per query is a bounded window over the scored frame.
  *
  * Scoring is the Lucene BM25 variant with k1 = 1.2, b = 0.75 fixed so
  * the term weight reduces to an integer-exact rational:
  *
  *   idf(t)    = ln((2N + 2) / (2 df + 1))
  *   rat(t, d) = 44 L tf / (20 L tf + 6 L + 18 dl N)
  *   w(t, d)   = idf(t) * rat(t, d)
  *
  * where N = corpus size, L = total token count, dl = document length
  * — both ln argument and rational are built from int64 counts, so the
  * only floating-point steps are one ln, one divide, one multiply in a
  * fixed order. Per-term weights are floor-scaled to e9 longs before
  * the per-(query, doc) sum, making the score integer-exact and the
  * ranking independent of float summation order on any engine
  * (the [[graft.core.Exact]] discipline). int64 headroom: the rational's
  * terms stay under 9e18 while L * tf < 2e17 — beyond that, pre-divide
  * L out of the rational.
  */
object Bm25 {

  /** Lowercase alpha tokens of length >= 3 — the corpus-audit
    * tokenization shared with the TF-IDF keyword stage. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), t => length(t) >= 3)

  /** Top-`k` documents per query by BM25.
    *
    * @param docs    corpus (idCol, textCol, ...)
    * @param queries query set (qidCol, termCol) — one row per query
    *                term, small enough to broadcast (it is a human or
    *                benchmark query workload, not a corpus)
    * @return (qidCol, rank, idCol, bm25_e9) — rank 1..k by
    *         (score desc, id asc); bm25_e9 is the e9-scaled integer
    *         score
    */
  def retrieve(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qidCol: String, termCol: String,
               k: Int): DataFrame = {
    val id = col(idCol)
    val toks = docs.select(id, explode(tokens(col(textCol))).as("__term"))
    val tf = toks.groupBy(id, col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dl = tf.groupBy(id).agg(sum(col("__tf")).as("__dl"))
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val totals = broadcast(
      docs.agg(count(lit(1)).as("__n"))
        .crossJoin(dl.agg(sum(col("__dl")).as("__l"))))

    val qt = broadcast(
      queries.select(col(qidCol), col(termCol).as("__term")))
    val idfNum = (lit(2L) * col("__n") + lit(2L)).cast("double")
    val idfDen = (lit(2L) * col("__df") + lit(1L)).cast("double")
    val ratNum = (lit(44L) * col("__l") * col("__tf")).cast("double")
    val ratDen = (lit(20L) * col("__l") * col("__tf") +
      lit(6L) * col("__l") + lit(18L) * col("__dl") * col("__n")).cast("double")
    val weight = log(idfNum / idfDen) * (ratNum / ratDen)

    val scored = tf.join(qt, "__term")
      .join(dfreq, "__term")
      .join(dl, idCol)
      .crossJoin(totals)
      .withColumn("__w_e9", floor(weight * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col(qidCol), id)
      .agg(sum(col("__w_e9")).as("bm25_e9"))

    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("bm25_e9").desc, id.asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), id, col("bm25_e9"))
  }
}
