package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher document-quality rules (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * table A1) as one wide column projection — the standard pre-filter a
  * web-scale training corpus passes before dedup/classifier stages.
  *
  * Every rule is a pure column expression over one tokenization pass,
  * so the whole bundle runs inside a single whole-stage-codegen
  * projection on the scan: no shuffle, no UDF, no second pass over the
  * text. At 100 TB this is a map-only stage that pushes the column
  * prune (id, text) into the file source.
  *
  * Rule set (names follow the paper):
  *   - `r_word_count`:   50 ≤ word count ≤ 100 000
  *   - `r_word_len`:     3 ≤ mean word length ≤ 10
  *   - `r_symbol_ratio`: (# + …) to word ratio ≤ 0.1
  *   - `r_bullet_lines`: ≤ 90 % of lines start with a bullet
  *   - `r_ellipsis_lines`: ≤ 30 % of lines end with an ellipsis
  *   - `r_alpha_words`:  ≥ 80 % of words contain an alphabetic char
  *   - `r_stopwords`:    ≥ 2 distinct "required" stopwords present
  *   - `keep`:           conjunction of all seven
  *
  * Thresholds are integer-cross-multiplied (`n·100 ≤ d·k` style), so
  * there is no float threshold to diverge between engines.
  */
object GopherRules {

  /** The paper's required-stopword list. */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Appends the seven rule flags plus `keep` to each row. */
  def flags(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val ws = TextFunctions.wsTokens(text)
    val nWords = size(ws)
    val lines = split(text, "\n")
    val nLines = size(lines)
    val sumWordLen = aggregate(ws, lit(0L), (acc, t) => acc + length(t))
    val nSymbols = length(text) - length(regexp_replace(text, "#|\\.\\.\\.", ""))
    val nBullet = size(filter(lines, l => trim(l).rlike("^[-*•]")))
    val nEllipsis = size(filter(lines, l => trim(l).rlike("\\.\\.\\.$")))
    val nAlpha = size(filter(ws, t => t.rlike("[A-Za-z]")))
    val nStop = size(filter(
      array(RequiredStopwords.map(lit): _*), s => array_contains(ws, s)))
    df
      .withColumn("r_word_count", nWords >= 50 && nWords <= 100000)
      // mean word length in [3, 10] ⟺ 3·n ≤ Σlen ≤ 10·n
      .withColumn("r_word_len",
        sumWordLen >= lit(3L) * nWords && sumWordLen <= lit(10L) * nWords)
      // symbol-to-word ratio ≤ 0.1 ⟺ 10·symbols ≤ words
      .withColumn("r_symbol_ratio", lit(10L) * nSymbols <= nWords)
      // ≤ 90 % bullet lines ⟺ 10·bullets ≤ 9·lines
      .withColumn("r_bullet_lines", lit(10L) * nBullet <= lit(9L) * nLines)
      // ≤ 30 % ellipsis-terminated lines ⟺ 10·ellipsis ≤ 3·lines
      .withColumn("r_ellipsis_lines", lit(10L) * nEllipsis <= lit(3L) * nLines)
      // ≥ 80 % alphabetic words ⟺ 5·alpha ≥ 4·words
      .withColumn("r_alpha_words", lit(5L) * nAlpha >= lit(4L) * nWords)
      .withColumn("r_stopwords", nStop >= 2)
      .withColumn("keep",
        col("r_word_count") && col("r_word_len") && col("r_symbol_ratio") &&
          col("r_bullet_lines") && col("r_ellipsis_lines") &&
          col("r_alpha_words") && col("r_stopwords"))
  }

  /** The filter arm: rows passing all rules, original columns only. */
  def filterDocs(df: DataFrame, textCol: String): DataFrame =
    flags(df, textCol).filter(col("keep")).select(df.columns.map(col): _*)
}
