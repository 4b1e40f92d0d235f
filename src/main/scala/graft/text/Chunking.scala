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
}
