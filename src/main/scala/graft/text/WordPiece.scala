package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece-style greedy longest-match segmentation (the BERT
  * tokenizer apply loop, Wu et al. 2016 / Devlin et al. 2019) — the
  * INFERENCE-side companion to the suite's BPE trainer (q130): given a
  * piece vocabulary with distinct initial/continuation forms, each
  * word segments by repeatedly taking the longest vocab piece that
  * prefixes the remainder; a word with an unmatchable position becomes
  * one [UNK] (the whole-word-UNK convention).
  *
  * Vocabulary construction is deterministic and census-based: every
  * substring occurrence up to `maxPieceLen` counts, tagged initial
  * (position 1) or continuation; all observed single chars enter
  * unconditionally, longer pieces by (count desc, form, piece) top-V —
  * a TOTAL order, so the cap replays exactly in any engine.
  *
  * Scale shape: the census is one explode + one groupBy (substring
  * occurrences ≈ chars × maxPieceLen); the ONLY collect is the
  * bounded V-row vocabulary (the [[Bpe.learn]] policy), which then
  * broadcasts into the apply UDF — dictionary-driven control flow no
  * Catalyst expression expresses (the [[Bpe.encodeStats]] precedent).
  * A document's piece count is a pure function of its text, so the
  * output is partition-independent. */
object WordPiece {

  case class Vocab(initial: Set[String], cont: Set[String], maxLen: Int)

  def buildVocab(df: DataFrame, textCol: String,
                 maxPieceLen: Int, topV: Int): Vocab = {
    val words = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val pieces = words
      .select(col("w"), explode(sequence(lit(1), length(col("w")))).as("p"))
      .select(col("w"), col("p"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("p") + col("l") - 1 <= length(col("w")))
      .select(expr("substring(w, p, l)").as("piece"),
        when(col("p") === 1, 0).otherwise(1).as("form"))
    val census = pieces.groupBy(col("piece"), col("form"))
      .agg(count(lit(1)).as("c"))
    val chars = census.filter(length(col("piece")) === 1)
      .select(col("piece"), col("form"))
    val top = census.filter(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("form"), col("piece"))
      .limit(topV)
      .select(col("piece"), col("form"))
    val rows = chars.unionByName(top).collect() // bounded: V + charset rows
    Vocab(
      initial = rows.filter(_.getInt(1) == 0).map(_.getString(0)).toSet,
      cont = rows.filter(_.getInt(1) == 1).map(_.getString(0)).toSet,
      maxLen = maxPieceLen)
  }

  /** Input columns + (n_words, n_pieces, n_unk_words). [UNK] counts as
    * one piece. */
  def segmentStats(df: DataFrame, textCol: String, vocab: Vocab): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(vocab)
    val seg = udf { (text: String) =>
      if (text == null) (0L, 0L, 0L)
      else {
        val v = bc.value
        val words = text.trim.split("\\s+").filter(_.nonEmpty)
        var pieces = 0L
        var unk = 0L
        words.foreach { w =>
          var pos = 0
          var n = 0L
          var failed = false
          while (pos < w.length && !failed) {
            val set = if (pos == 0) v.initial else v.cont
            var l = math.min(v.maxLen, w.length - pos)
            while (l > 0 && !set.contains(w.substring(pos, pos + l))) l -= 1
            if (l == 0) failed = true
            else { pos += l; n += 1 }
          }
          if (failed) { pieces += 1; unk += 1 }
          else pieces += n
        }
        (words.length.toLong, pieces, unk)
      }
    }
    df.withColumn("__seg", seg(col(textCol)))
      .withColumn("n_words", col("__seg._1"))
      .withColumn("n_pieces", col("__seg._2"))
      .withColumn("n_unk_words", col("__seg._3"))
      .drop("__seg")
  }
}
