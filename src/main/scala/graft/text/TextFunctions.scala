package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: token
  * counting, shingling, language-ID scoring, quality features and
  * document fingerprinting.
  *
  * Everything is composed from codegen'd built-ins (split /
  * higher-order array functions / md5) — no UDFs — and every function
  * is expressible in portable ANSI SQL so results can be oracle-checked
  * engine-to-engine. Token equality (via `filter`) is used instead of
  * substring counting so overlapping-match semantics can't diverge.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text (non-empty input assumed). */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish lexer tokens: letter runs, digit runs, single other
    * non-space chars — a cheap proxy for subword token counts. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** Count of tokens exactly equal to `w`. */
  def tokenCount(tokens: Column, w: String): Column =
    size(filter(tokens, t => t === lit(w))).cast("long")

  /** Count of tokens in a set. */
  def tokenSetCount(tokens: Column, ws: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(ws))).cast("long")

  /** Distinct word k-shingles ("w1 w2 … wk"), the unit for Jaccard /
    * MinHash dedup. Empty array when the document is shorter than k. */
  /** Token n-grams WITH multiplicity (no distinct) — repetition
    * statistics need frequencies, where [[shingles]] dedupes for set
    * semantics. */
  // Both run in the native [[WordNgrams]] expression: the compositional
  // transform(sequence)+concat_ws spelling evaluates an interpreted
  // lambda per token position across the entire dedup/overlap/
  // repetition family (WordNgramsSpec pins bit-parity with it).
  def ngrams(tokens: Column, k: Int): Column =
    call_function("word_ngrams", tokens, lit(k), lit(false))

  def shingles(tokens: Column, k: Int): Column =
    call_function("word_ngrams", tokens, lit(k), lit(true))

  /** Stopword-marker language scores: returns the language whose marker
    * tokens appear most often (ties → lexicographically first;
    * no hits → "und" undetermined). n-gram-frequency heuristic in the
    * spirit of fastText-free langid. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "nicht"),
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "et", "les", "une"))

  def langScores(tokens: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, ms) => lang -> tokenSetCount(tokens, ms) }

  def predictLang(tokens: Column): Column = {
    val scores = langScores(tokens)
    // argmax with deterministic tie-break on language code.
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight means earlier langs override later ones at equal score.
    pick
  }

  /** Quality features + a fixed-weight score in [0,1]-ish. Deterministic
    * integer/double arithmetic only. */
  def qualityScore(text: Column, tokens: Column): Column = {
    val nTok = size(tokens).cast("double")
    // Σ length(token) == length of the separator-free join — same
    // integer, but array_join is a codegen'd built-in where the
    // aggregate fold runs an interpreted lambda per token
    val meanLen = length(array_join(tokens, "")).cast("double") / nTok
    val stopRatio = tokenSetCount(tokens, Seq("the", "a", "and", "of", "to", "in")).cast("double") / nTok
    val digitRatio = size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("double") /
      length(text).cast("double")
    lit(0.4) * least(stopRatio * lit(4.0), lit(1.0)) +
      lit(0.4) * least(meanLen / lit(8.0), lit(1.0)) +
      lit(0.2) * (lit(1.0) - least(digitRatio * lit(10.0), lit(1.0)))
  }

  /** Normalized-content fingerprint: md5 of lowercased,
    * whitespace-collapsed, trimmed text — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Template-normalized fingerprint: the [[fingerprint]] key after
    * masking the VOLATILE spans — URLs then digit runs (in that order;
    * URLs contain digits) — so instruction/boilerplate documents that
    * differ only in ids, counts, dates or links dedup as one template.
    * The masked-dedup pass instruction-data curation runs beside the
    * raw exact pass: raw catches byte copies, this catches the mail-
    * merge class raw misses. Patterns stay in the Java∩RE2 subset so
    * any engine reproduces every masked byte. */
  def templateFingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
      "https?://[^ \\t\\n]+", "<url>"),
      "[0-9]+", "<num>"),
      "\\s+", " ")))
}
