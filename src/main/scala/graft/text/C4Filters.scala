package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 line- and document-level cleaning rules (Raffel et al. 2020,
  * "Exploring the Limits of Transfer Learning with a Unified
  * Text-to-Text Transformer", §2.2) — the line-grain complement to the
  * document-grain [[GopherRules]]: C4 REPAIRS documents by dropping bad
  * lines, Gopher drops whole documents.
  *
  * Line rules (a line survives iff all hold):
  *   - ends in terminal punctuation (. ! ? ")
  *   - has at least `minLineWords` words (paper: 3)
  *   - does not contain a blocklisted boilerplate phrase
  *     ("javascript", "cookie policy", "privacy policy", "terms of use")
  * Document rules (document dropped outright when any holds):
  *   - contains "lorem ipsum"
  *   - contains a curly brace (code markers)
  *   - fewer than `minDocLines` surviving lines (paper: 3 sentences)
  *
  * Everything is higher-order array expressions over ONE `split` of the
  * text — `filter`/`exists` lambdas inside whole-stage codegen, no
  * explode, no shuffle, no UDF: at 100 TB this is a map-only scan
  * stage, the same shape as [[GopherRules]]. Phrase matching is
  * lowercase `contains`, the paper's rule.
  */
object C4Filters {

  val BoilerplatePhrases: Seq[String] =
    Seq("javascript", "cookie policy", "privacy policy", "terms of use")

  /** Per-document repair report: `n_lines` (original), `n_kept_lines`,
    * `doc_dropped` (lorem-ipsum / brace / too-few-surviving-lines), and
    * `cleaned` (surviving lines re-joined by '\n'; empty when the
    * document is dropped). */
  def clean(df: DataFrame, textCol: String,
            minLineWords: Int = 3, minDocLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    def lineOk(l: Column): Column = {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        size(TextFunctions.wsTokens(t)) >= minLineWords &&
        !BoilerplatePhrases.map(p => lower(t).contains(p)).reduce(_ || _)
    }
    val lower_ = lower(col(textCol))
    val hasLorem = lower_.contains("lorem ipsum")
    val hasBrace = col(textCol).contains("{") || col(textCol).contains("}")
    df
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("__kept", filter(lines, lineOk _))
      .withColumn("n_kept_lines", size(col("__kept")).cast("long"))
      .withColumn("doc_dropped",
        hasLorem || hasBrace || col("n_kept_lines") < minDocLines)
      .withColumn("cleaned",
        when(col("doc_dropped"), lit(""))
          .otherwise(concat_ws("\n", col("__kept"))))
      .drop("__kept")
  }

  /** The filter arm: surviving documents only, text replaced by the
    * cleaned line set, original column order preserved. */
  def filterDocs(df: DataFrame, textCol: String,
                 minLineWords: Int = 3, minDocLines: Int = 3): DataFrame =
    clean(df, textCol, minLineWords, minDocLines)
      .filter(!col("doc_dropped"))
      .withColumn(textCol, col("cleaned"))
      .select(df.columns.map(col): _*)
}
