package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline — the stage chain a raw crawl
  * runs before it becomes training data, in the order that makes each
  * stage sound:
  *
  *   1. Unicode NFC normalization ([[graft.functions.NfcNormalize]]) —
  *      equality-based stages downstream must see one spelling;
  *   2. PII redaction ([[Pii.scrub]]) — BEFORE dedup, because two
  *      crawls of the same page differ precisely in volatile
  *      PII-bearing chrome (session ids, contact variants): redaction
  *      canonicalizes them into exact duplicates;
  *   3. exact duplicate collapse on the redacted fingerprint (md5,
  *      keep-min-id — one hash aggregation, the [[graft.dedup.Dedup]]
  *      discipline);
  *   4. token-count quality gate.
  *
  * Everything is per-row expressions plus ONE fingerprint aggregation
  * and its join back — two shuffles total at any corpus size, no
  * driver-side state. Every stage's verdict is carried as a column so
  * the output is an auditable per-document report, not just the
  * surviving subset ([[kept]] filters it).
  */
object Curation {

  /** Per-document curation report: stage verdict columns
    * (`n_emails`/`n_ips`/`n_phones`, `n_copies`, `is_canonical`,
    * `n_tokens`, `passes_quality`, `kept`) plus the `redacted` text.
    * Requires globally-unique ids across the unioned input crawls. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minTokens: Int): DataFrame = {
    graft.functions.NfcNormalize.register(docs.sparkSession)
    val carried = docs.columns.filterNot(c => c == textCol).map(col).toSeq
    // widen first: NFC + the PII regex battery is the CPU-dense stage,
    // and a compact input (union of one-file crawls locally) would pin
    // it to as many tasks as files (Widen is a no-op on well-split
    // production inputs)
    val base = graft.core.Widen.widen(docs).select(carried :+
      call_function("unicode_nfc", col(textCol)).as("__norm"): _*)
    val red = Pii.scrub(base, "__norm").drop("__norm")
    val fp = red.withColumn("__fp", md5(col("redacted")))
    // r12: keep-min-id + group size as WINDOW functions over the
    // fingerprint partitioning, not a groupBy + join back — the join
    // shape evaluated the NFC + PII regex battery twice (once under
    // the keeper aggregation, once on the join's probe side) and paid
    // two exchanges; the window is one exchange, one evaluation
    // (guide §2.4: operations keyed the same way share one exchange).
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
    fp.withColumn("__keep_id", min(col(idCol)).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("is_canonical", col(idCol) === col("__keep_id"))
      .withColumn("n_tokens",
        size(TextFunctions.wsTokens(col("redacted"))).cast("long"))
      .withColumn("passes_quality", col("n_tokens") >= minTokens)
      .withColumn("kept", col("is_canonical") && col("passes_quality"))
      .drop("__fp", "__keep_id")
  }

  /** The surviving corpus: canonical, quality-passing rows only. */
  def kept(docs: DataFrame, idCol: String, textCol: String,
           minTokens: Int): DataFrame =
    curate(docs, idCol, textCol, minTokens).filter(col("kept"))
}
