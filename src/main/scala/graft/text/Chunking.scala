package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Long-document chunking into overlapping token windows (builder
  * mandate: training/retrieval pipelines split documents that exceed
  * the context budget, keeping `overlap` tokens of left context per
  * window).
  *
  * Window w of a document covers tokens `[w·stride, min(w·stride +
  * maxTokens, n))` with `stride = maxTokens − overlap`; the window
  * count is the smallest number whose last window reaches the document
  * end, so no degenerate fully-contained tail windows are emitted and
  * a document within budget stays whole. All arithmetic is integer —
  * bit-reproducible — and the shape is one bounded explode off the
  * tokenizer (no shuffle, no state; work scales with output tokens).
  */
object Chunking {

  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    // Generate boundary keeps the token array materialized (a plain
    // projection chain would let CollapseProject re-tokenize per
    // element reference — see QualityFilters)
    val base = graft.core.Widen.widen(df)
      .select(col(idCol).as("doc"), TextFunctions.wsTokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
    val nWin = when(col("__n") <= maxTokens, lit(1L))
      .otherwise(expr(s"(__n - $maxTokens + ${stride - 1}) div $stride") + 1L)
    val start = col("__w") * stride
    base
      .withColumn("__w", explode(sequence(lit(0L), nWin - 1L)))
      .select(col("doc"),
        col("__w").as("window_idx"),
        start.as("tok_start"),
        least(start + maxTokens, col("__n")).as("tok_end"),
        concat_ws(" ", slice(col("__t"), (start + 1L).cast("int"),
          least(lit(maxTokens.toLong), col("__n") - start).cast("int")))
          .as("chunk_text"))
  }

  /** Sentence-boundary chunking — the RAG splitter: a document's
    * sentences (runs up to `.!?`, trailing tail included, blanks
    * dropped) pack GREEDILY into chunks of ≤ `maxTokens` whitespace
    * tokens; a single over-budget sentence becomes its own (oversize)
    * chunk rather than being split mid-sentence. The greedy fill is a
    * non-associative per-document fold, so it runs as one ordered
    * `aggregate` over the sentence array — document-local, no state
    * across rows, no shuffle; work scales with sentences. Output: one
    * row per (doc, chunk_idx) with sentence/token counts.
    *
    * Deterministic: sentence order is text order, token counts are
    * the `wsTokens` convention, all arithmetic integer — a SQL oracle
    * replays the fold as a per-sentence recursive chain. */
  def sentenceChunks(df: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val sents = filter(
      regexp_extract_all(col(textCol), lit("[^.!?]+[.!?]*"), lit(0)),
      s => length(trim(s)) > 0)
    val counts = transform(col("__sents"),
      s => size(TextFunctions.wsTokens(s)).cast("long"))
    // greedy fill: acc = (fill, chunk id so far, per-sentence chunk ids);
    // fill starts AT the budget so the first sentence always opens chunk 0
    val emptyIds = array().cast("array<bigint>")
    val chunkIds = aggregate(
      col("__n"),
      struct(lit(maxTokens.toLong).as("fill"), lit(-1L).as("cid"),
        emptyIds.as("ids")),
      (acc, n) => {
        val fits = acc.getField("fill") + n <= maxTokens
        val cid = when(fits, acc.getField("cid")).otherwise(acc.getField("cid") + 1L)
        struct(
          when(fits, acc.getField("fill") + n).otherwise(n).as("fill"),
          cid.as("cid"),
          concat(acc.getField("ids"), array(cid)).as("ids"))
      },
      acc => acc.getField("ids"))
    graft.core.Widen.widen(df)
      .select(col(idCol).as("doc"), sents.as("__sents"))
      .withColumn("__n", counts)
      .withColumn("__cid", chunkIds)
      .select(col("doc"),
        posexplode(zip_with(col("__n"), col("__cid"),
          (n, cid) => struct(n.as("n"), cid.as("cid")))).as(Seq("__i", "__e")))
      .groupBy(col("doc"), col("__e.cid").as("chunk_idx"))
      .agg(count(lit(1)).as("n_sentences"), sum(col("__e.n")).as("n_tokens"))
  }
}
