package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus curation — [[graft.text.Curation]]'s stage chain
  * over an unbounded crawl. Every content stage (NFC normalization,
  * PII redaction, fingerprinting, the token-count quality gate) is a
  * stateless per-row expression, so it runs IDENTICALLY on a batch
  * frame and a micro-batch; the only stateful stage is the duplicate
  * collapse, which becomes [[StreamDedup]] on the redacted
  * fingerprint.
  *
  * Semantic delta vs the batch operator, stated rather than hidden:
  * batch keeps the MINIMUM id per fingerprint; a stream keeps the
  * FIRST ARRIVAL (ids from the future are unknowable). When crawl
  * order is id order the two coincide (StreamCurationSpec asserts it).
  *
  * State regimes mirror [[StreamDedup]]: `watermarkDelay = None` holds
  * every fingerprint forever (exact, unbounded keys — fine for bounded
  * recrawl campaigns); `Some(delay)` bounds state to the watermark
  * window — the 100 TB default, correct whenever a page's recrawls
  * land within the delay of each other.
  */
object StreamCuration {

  /** The curated stream: canonical, quality-passing documents only,
    * with `redacted` text and per-row audit columns (`n_emails`,
    * `n_ips`, `n_phones`, `n_tokens`). */
  def kept(crawl: DataFrame, idCol: String, textCol: String, tsCol: String,
           minTokens: Int, watermarkDelay: Option[String] = None): DataFrame = {
    graft.functions.NfcNormalize.register(crawl.sparkSession)
    val carried = crawl.columns.filterNot(_ == textCol).map(col).toSeq
    val base = crawl.select(carried :+
      call_function("unicode_nfc", col(textCol)).as("__norm"): _*)
    val red = graft.text.Pii.scrub(base, "__norm").drop("__norm")
      .withColumn("__fp", md5(col("redacted")))
      .withColumn("n_tokens",
        size(graft.text.TextFunctions.wsTokens(col("redacted"))).cast("long"))
      // gate BEFORE dedup: the verdict is a function of the
      // fingerprinted bytes (all copies share it), so filtering first
      // changes nothing semantically and keeps rejected rows out of
      // the dedup state store
      .filter(col("n_tokens") >= minTokens)
    val deduped = watermarkDelay match {
      case Some(delay) => StreamDedup.withinWatermark(red, Seq("__fp"), tsCol, delay)
      case None => StreamDedup.exactOnce(red, Seq("__fp"))
    }
    deduped.drop("__fp")
  }
}
