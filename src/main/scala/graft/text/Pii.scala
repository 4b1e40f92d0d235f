package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the scrub pass a
  * training-data pipeline runs before any corpus leaves the trust
  * boundary (emails, phone numbers, bare IPv4 addresses).
  *
  * Pure codegen'd `regexp_extract_all` / `regexp_replace` column
  * expressions — no UDFs, no shuffle; the scrub rides whatever scan is
  * already reading the text, so at 100 TB it costs one pass and
  * parallelises with the input partitioning.
  *
  * The patterns deliberately use only the regex subset with identical
  * semantics in Java (`java.util.regex`, Spark) and RE2 (DuckDB, Go):
  * explicit character classes, bounded/unbounded repetition, `\d`,
  * ASCII `\b` — no backreferences, no lookaround — so every count and
  * every redacted byte is engine-reproducible and oracle-checkable.
  * Redaction order is email → IPv4 → phone: emails are the most
  * specific shape and must not be partially consumed by the looser
  * numeric patterns; the `<EMAIL>`/`<IP>`/`<PHONE>` placeholders match
  * none of the patterns, so the pass is idempotent.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?\\d{1,3}-\\d{3}-\\d{3,4}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Non-overlapping match count of `re` in `text`, as long. */
  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** `text` with all three PII shapes replaced by typed placeholders. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-row scrub report: the input columns plus match counts per PII
    * class and the redacted text. Counts are taken BEFORE redaction so
    * they describe the original row even though the redactions nest. */
  def scrub(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails", countMatches(col(textCol), EmailRe))
      .withColumn("n_ips", countMatches(col(textCol), Ipv4Re))
      .withColumn("n_phones", countMatches(col(textCol), PhoneRe))
      .withColumn("redacted", redact(col(textCol)))
}
