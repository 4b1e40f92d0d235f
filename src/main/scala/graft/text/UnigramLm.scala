package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training by hard EM (the SentencePiece model,
  * Kudo 2018, with Viterbi re-estimation) — the OTHER tokenizer family
  * beside BPE (q130, merge-rule-based) and WordPiece (q213, greedy
  * inference): pieces carry probabilities, every word segments into
  * its MAXIMUM-LIKELIHOOD piece sequence, and EM re-estimates piece
  * probabilities from the segmentations until the inventory reflects
  * actual usage.
  *
  *  - Seed: the substring census (all pieces ≤ maxPieceLen; chars
  *    always in, longer pieces by total-order top-V), probabilities
  *    proportional to raw counts.
  *  - E-step: per word, the Viterbi segmentation maximizing
  *    Π p(piece) — a DP over positions. The path score is a
  *    LEFT-TO-RIGHT product of per-piece probabilities (each a single
  *    IEEE divide of two int64 counts), so any engine replays every
  *    score bit-for-bit — no logs, no transcendentals. Ties break by
  *    (fewer pieces, then lexicographically smallest
  *    separator-joined path); both keys are prefix-decomposable, so
  *    the DP argmin equals the global enumeration order the oracle
  *    uses.
  *  - M-step: piece usage counts across all word OCCURRENCES (word
  *    census frequencies — integers) become the next iteration's
  *    probabilities.
  *
  * Scale shape: censuses and usage counts are distributed groupBys;
  * the ONLY collect is the bounded V-row vocabulary per EM round (the
  * [[Bpe.learn]] policy), broadcast into the per-word Viterbi UDF
  * ([[Bpe.encodeStats]] precedent). Segmentation of a word is a pure
  * function of (word, vocab), so everything is partition-independent.
  */
object UnigramLm {

  /** piece → (count, prob); prob = count / total as one IEEE divide. */
  type Vocab = Map[String, Double]

  case class Model(probs: Vocab, maxLen: Int)

  /** Viterbi segmentation of one word; None when some position is
    * uncoverable (can't happen once all chars are in the vocab). */
  def segment(w: String, m: Model): Option[Seq[String]] = {
    val n = w.length
    // per position: (score, npieces, path) of the best segmentation of
    // the prefix ending there; path joined by  for the lex key
    val best = new Array[(Double, Int, String)](n + 1)
    best(0) = (1.0, 0, "")
    var p = 1
    while (p <= n) {
      var cand: (Double, Int, String) = null
      var l = 1
      while (l <= math.min(m.maxLen, p)) {
        val prev = best(p - l)
        if (prev != null) {
          val piece = w.substring(p - l, p)
          m.probs.get(piece).foreach { pr =>
            val sc = prev._1 * pr
            val np = prev._2 + 1
            val path = if (prev._3.isEmpty) piece else prev._3 + "\u0001" + piece
            if (cand == null || sc > cand._1 ||
              (sc == cand._1 && (np < cand._2 ||
                (np == cand._2 && path < cand._3))))
              cand = (sc, np, path)
          }
        }
        l += 1
      }
      best(p) = cand
      p += 1
    }
    Option(best(n)).map(_._3.split('\u0001').toSeq)
  }

  /** One census pass: word frequencies (all occurrences). */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Seed counts: every substring occurrence ≤ maxPieceLen, weighted
    * by word frequency; chars always kept, longer pieces top-V by
    * (count desc, piece asc). Returns (piece, cnt) rows. */
  def seedCounts(wf: DataFrame, maxPieceLen: Int, topV: Int): DataFrame = {
    val pieces = wf
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")))).as("p"))
      .select(col("w"), col("freq"), col("p"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("p") + col("l") - 1 <= length(col("w")))
      .select(expr("substring(w, p, l)").as("piece"), col("freq"))
    val census = pieces.groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val chars = census.filter(length(col("piece")) === 1)
    val top = census.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(topV)
    chars.unionByName(top)
  }

  /** Bounded collect of (piece, cnt) rows into a Model: prob =
    * cnt / Σcnt, each a single IEEE divide of int64 counts. */
  def toModel(counts: DataFrame, maxPieceLen: Int): Model = {
    val rows = counts.collect().map(r => r.getString(0) -> r.getLong(1))
    val total = rows.map(_._2).sum.toDouble
    Model(rows.map { case (p, c) => p -> (c / total) }.toMap, maxPieceLen)
  }

  /** M-step: usage counts of each piece across the Viterbi
    * segmentations of all word occurrences. */
  def usageCounts(wf: DataFrame, m: Model): DataFrame = {
    val bc = wf.sparkSession.sparkContext.broadcast(m)
    val segUdf = udf { (w: String) =>
      segment(w, bc.value).getOrElse(Seq.empty[String])
    }
    wf.select(explode(segUdf(col("w"))).as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
  }

  /** Full training: seed → emIters × (Viterbi usage → re-normalize).
    * Pieces that lose all usage drop out (their probability mass is
    * reassigned by the normalization) — the EM pruning effect. Chars
    * are re-added with their seed counts if pruning ever strands a
    * word (cannot happen while every used char piece survives, but the
    * guard keeps the model total). */
  def train(df: DataFrame, textCol: String, maxPieceLen: Int, topV: Int,
            emIters: Int): Model = {
    val wf = wordFreq(df, textCol).localCheckpoint(eager = true)
    var model = toModel(seedCounts(wf, maxPieceLen, topV), maxPieceLen)
    var it = 0
    while (it < emIters) {
      model = toModel(usageCounts(wf, model), maxPieceLen)
      it += 1
    }
    model
  }

  /** Segmentation stats under a model: input + (n_words, n_pieces). */
  def segmentStats(df: DataFrame, textCol: String, m: Model): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(m)
    val st = udf { (text: String) =>
      if (text == null) (0L, 0L)
      else {
        val words = text.trim.split("\\s+").filter(_.nonEmpty)
        var pieces = 0L
        words.foreach { w =>
          pieces += segment(w, bc.value).map(_.length.toLong).getOrElse(1L)
        }
        (words.length.toLong, pieces)
      }
    }
    df.withColumn("__s", st(col(textCol)))
      .withColumn("n_words", col("__s._1"))
      .withColumn("n_pieces", col("__s._2"))
      .drop("__s")
  }
}
