package graft

import graft.text.UnigramLm
import graft.text.UnigramLm.Model

/** Unigram-LM hard EM: Viterbi maximizes probability (not greed),
  * the documented tie-break order, EM pruning of unused pieces,
  * char-coverage totality, and partition-invariant training. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("Viterbi picks the maximum-probability split, not the longest piece") {
    val m = Model(Map("a" -> 0.4, "b" -> 0.05, "c" -> 0.4,
      "ab" -> 0.1, "bc" -> 0.1, "abc" -> 0.001), maxLen = 3)
    // abc: 0.001 | a+bc = ab+c = 0.04 | a+b+c = 0.008
    // tie at 0.04 → equal piece counts → lex: "abc" < "abc"
    assert(UnigramLm.segment("abc", m).get == Seq("a", "bc"))
  }

  test("tie-break: fewer pieces wins before lex") {
    val m = Model(Map("a" -> 0.2, "aa" -> 0.04, "aaa" -> 0.2), maxLen = 3)
    // aaaa: aa+aa = 0.0016; a+aaa / aaa+a = 0.04 each (2 pieces);
    // a+a+aa orders lower. best = 0.04 tie → lex "aaaa" < "aaaa"
    assert(UnigramLm.segment("aaaa", m).get == Seq("a", "aaa"))
  }

  test("EM prunes pieces the Viterbi step never uses") {
    // corpus of 'abab': seed has 'ba'/'bab'/... but Viterbi under the
    // seed picks one best split; after an EM round only used pieces
    // carry mass
    val docs = Seq.fill(10)("abab").toDF("text")
    val m = UnigramLm.train(docs, "text", maxPieceLen = 3, topV = 16,
      emIters = 2)
    val segs = UnigramLm.segment("abab", m).get
    // the model still covers the corpus and reproduces a stable split
    assert(segs.mkString == "abab")
    val used = segs.toSet
    // every piece with probability mass must be one the EM saw used
    assert(used.subsetOf(m.probs.keySet))
  }

  test("char coverage makes segmentation total; unseen word still splits") {
    val docs = Seq("ab ba", "ab ab").toDF("text")
    val m = UnigramLm.train(docs, "text", maxPieceLen = 2, topV = 8,
      emIters = 1)
    // 'aabb' never appeared, but chars a/b survive EM via usage in ab/ba
    val s = UnigramLm.segment("aabb", m)
    assert(s.isDefined && s.get.mkString == "aabb")
  }

  test("training is partition-invariant (counts are exact)") {
    val texts = (0 until 300).map(i => s"w${i % 9} ab${i % 5} xy")
    val m1 = UnigramLm.train(texts.toDF("text"), "text", 3, 64, 2)
    val m2 = UnigramLm.train(texts.toDF("text").repartition(17), "text", 3, 64, 2)
    assert(m1.probs == m2.probs)
  }

  test("segmentStats counts words and pieces") {
    val m = Model(Map("a" -> 0.5, "b" -> 0.25, "ab" -> 0.25), maxLen = 2)
    val out = UnigramLm.segmentStats(Seq("ab ab a").toDF("text"), "text", m)
      .collect()(0)
    // ab → 'ab' (0.25) vs a+b (0.125): 'ab' wins → 1 piece each
    assert(out.getAs[Long]("n_words") == 3L)
    assert(out.getAs[Long]("n_pieces") == 3L)
  }
}
