package graft

import graft.text.WordPiece
import graft.text.WordPiece.Vocab

/** WordPiece greedy longest-match: the unable=un+able classic, greedy
  * (not globally optimal) matching, whole-word UNK, form separation
  * (initial vs continuation), and census-vocab determinism with its
  * total-order cap. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def stats(texts: Seq[String], v: Vocab): (Long, Long, Long) = {
    val r = WordPiece.segmentStats(texts.toDF("text"), "text", v)
      .agg(org.apache.spark.sql.functions.sum("n_words"),
        org.apache.spark.sql.functions.sum("n_pieces"),
        org.apache.spark.sql.functions.sum("n_unk_words"))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("unable = un + able") {
    val v = Vocab(initial = Set("un"), cont = Set("able"), maxLen = 4)
    assert(stats(Seq("unable"), v) == (1L, 2L, 0L))
  }

  test("greedy longest match, not globally optimal") {
    // greedy takes 'ab' then must fail on 'c' if only 'bc' continues;
    // with cont {'c','bc'} it takes ab+c (2 pieces), never a+bc
    val v1 = Vocab(Set("a", "ab"), Set("c", "bc"), 4)
    assert(stats(Seq("abc"), v1) == (1L, 2L, 0L))
    // pathological: cont has only 'bc' — greedy 'ab' strands 'c' → UNK,
    // even though a+bc would have worked
    val v2 = Vocab(Set("a", "ab"), Set("bc"), 4)
    assert(stats(Seq("abc"), v2) == (1L, 1L, 1L))
  }

  test("whole-word UNK and form separation") {
    // 'ba': 'b' exists only as continuation, so the word cannot start
    val v = Vocab(Set("a"), Set("a", "b"), 4)
    assert(stats(Seq("ba"), v) == (1L, 1L, 1L))
    assert(stats(Seq("aa ab"), v) == (2L, 4L, 0L))
  }

  test("maxLen caps the probe even when longer pieces are in the set") {
    val v = Vocab(Set("abcd", "ab"), Set("cd"), 2)
    // maxLen 2: probes 'ab' first, never sees 'abcd'
    assert(stats(Seq("abcd"), v) == (1L, 2L, 0L))
  }

  test("census vocab: chars always in, top-V by (count, form, piece); segmentation matches hand result") {
    val docs = Seq.fill(5)("abab") ++ Seq.fill(3)("abc")
    val v = WordPiece.buildVocab(docs.toDF("text"), "text",
      maxPieceLen = 3, topV = 2)
    // counts (len>1): initial 'ab'(8) 'aba'(5) — cont 'ba'(5) 'bab'(5)
    //   'bc'(3) 'ab'(5+3? positions: in 'abab' cont 'ab' at pos 3 → 5)...
    // top-2 by count desc: initial 'ab'(8), then tie at 5 broken by
    //   (form, piece): cont pieces before none — form asc: initial
    //   'aba' (form 0) wins the tie over cont 'ab'/'ba'/'bab'
    assert(v.initial.contains("ab"))
    assert(v.initial.filter(_.length == 1) == Set("a"))
    assert(v.cont.filter(_.length == 1) == Set("a", "b", "c"))
    // with initial {a, ab, aba} and cont single chars only:
    //   'abab' → aba+b = 2 (greedy longest); 'abc' → ab+c = 2
    val (w, p, u) = stats(docs, v)
    assert((w, p, u) == (8L, 5L * 2 + 3L * 2, 0L))
  }
}
