package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Content-defined chunking (CDC) — the storage-dedup shape (Muthitacharoen
  * et al. SOSP'01 LBFS; FastCDC '16) applied to token streams: chunk
  * boundaries are drawn where a rolling window hash satisfies a divisor
  * condition, so INSERTING OR DELETING tokens only re-chunks a bounded
  * neighborhood — unlike fixed-size chunking, where one shifted token
  * re-fingerprints the whole tail of the document. Identical spans
  * re-chunk identically wherever they sit, so a plain chunk-hash census
  * finds shared/duplicated content across documents at chunk granularity
  * without any pairwise comparison.
  *
  * This is the "basic CDC" form: every position decides independently
  * (boundary at token i iff the hash of the w tokens ENDING at i is
  * ≡ 0 mod `divisor`), no min/max chunk clamps — the clamped variants
  * make the cut decision sequential per document and are deliberately
  * not ported. Expected chunk length is `divisor` tokens.
  *
  * Scale shape: the window hash and the running boundary count ride
  * per-document windows (a document is bounded; the corpus never
  * serializes through one task), chunk assembly is one groupBy with an
  * array_sort — no collect, no cross-doc window — and the duplicate
  * census is one shuffle keyed on the chunk hash.
  *
  * (Acronym collision: [[graft.streaming.StreamCdc]] is CHANGE-data
  * capture, the snapshot-merge lakehouse path — unrelated. The
  * streaming arm of THIS operator is
  * [[graft.streaming.StreamChunkDedup]].)
  */
object Cdc {

  /** Token-level basic CDC. Returns one row per chunk:
    * (doc, chunk, n_toks, ctext, fp) with `chunk` the 0-based ordinal,
    * `ctext` the space-joined chunk text and `fp` its md5. The window
    * hash is the established Horner chain over [[Dedup.md5Hash28]]
    * token hashes (q61's kh arithmetic), but over LAGS: the cut
    * decision at i looks backward only — the CDC invariant that makes
    * boundaries stable under downstream edits. Tokens at i < w−1 have
    * no full window (null hash → never a boundary), so every document
    * opens chunk 0 at token 0. */
  def chunks(df: DataFrame, idCol: String, textCol: String,
             w: Int = 3, divisor: Long = 8L): DataFrame = {
    // Horner chain headroom (audited): every reduced term is < M < 2^31
    // and md5Hash28 < 2^28, so each step's pre-mod value is at most
    // (M−1)·B + 2^28 < 2^31 · 2^20 + 2^28 < 2^52 — int64 never wraps,
    // and both engines reduce nonnegative values so `%` agrees between
    // Spark and DuckDB (no negative-operand remainder divergence).
    val B = 1000003L
    val M = 2147483647L
    val toks = df
      .select(col(idCol).as("doc"),
        posexplode(TextFunctions.wsTokens(col(textCol))).as(Seq("i", "tok")))
      .withColumn("h", Dedup.md5Hash28(col("tok")))
    val order = Window.partitionBy(col("doc")).orderBy(col("i"))
    val gh = (1 until w).foldLeft(col("h")) { (acc, j) =>
      (acc * B + lag(col("h"), j).over(order)) % M
    }
    toks
      .withColumn("__b",
        when(gh.isNotNull && gh % divisor === 0, lit(1L)).otherwise(lit(0L)))
      // a boundary at i ENDS the chunk at i: token j belongs to chunk
      // #(boundaries strictly before j)
      .withColumn("chunk",
        coalesce(sum(col("__b")).over(
          order.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .groupBy(col("doc"), col("chunk"))
      .agg(
        count(lit(1)).as("n_toks"),
        array_join(transform(array_sort(collect_list(struct(col("i"), col("tok")))),
          x => x.getField("tok")), " ").as("ctext"))
      .withColumn("fp", md5(col("ctext")))
  }

  /** Per-document duplication census over the CDC chunks: how many of
    * a document's chunks (and how much of its token mass) also occur —
    * byte-identical — anywhere else in the corpus. One chunk-hash
    * census joined back to the instances. */
  def dedupCensus(chunked: DataFrame): DataFrame = {
    // two consumers (the census + the join-back): pin the chunk frame
    // or the explode/window/assembly pipeline above runs twice
    val ch = chunked.localCheckpoint(eager = false)
    val global = ch.groupBy(col("fp"))
      .agg(count(lit(1)).as("__cnt"))
    ch.join(global, Seq("fp"))
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("__cnt") > 1, lit(1L)).otherwise(lit(0L))).as("n_dup_chunks"),
        sum(when(col("__cnt") > 1, col("n_toks")).otherwise(lit(0L))).as("dup_tokens"))
  }
}
