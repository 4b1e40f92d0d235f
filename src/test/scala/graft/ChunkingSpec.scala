package graft

import graft.text.Chunking

/** Sliding-window chunking: window layout, overlap, boundary cases,
  * and exact text slicing. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("slidingWindows: layout, overlap and content on a hand-computed doc") {
    // 10 tokens, maxTokens 4, overlap 1 (stride 3):
    // windows [0,4) [3,7) [6,10) — the last reaches the end exactly
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val ch = Chunking.slidingWindows(docs, "doc_id", "text", maxTokens = 4, overlap = 1)
      .orderBy("window_idx")
      .select("window_idx", "tok_start", "tok_end", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(ch == Seq(
      (0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 3L, 7L, "t3 t4 t5 t6"),
      (2L, 6L, 10L, "t6 t7 t8 t9")))
  }

  test("slidingWindows: docs within budget stay whole; exact-fit emits one window") {
    val docs = Seq((1L, "a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val ch = Chunking.slidingWindows(docs, "doc_id", "text", maxTokens = 4, overlap = 2)
      .select("doc", "window_idx", "tok_end", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
    assert(ch.count(_._1 == 1L) == 1 && ch.count(_._1 == 2L) == 1)
    assert(ch.find(_._1 == 1L).get._4 == "a b c")
    assert(ch.find(_._1 == 2L).get._4 == "a b c d")
  }

  test("slidingWindows: every token covered; no window past the end") {
    val docs = Seq((1L, (0 until 101).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val ch = Chunking.slidingWindows(docs, "doc_id", "text", maxTokens = 16, overlap = 4)
      .select("tok_start", "tok_end").as[(Long, Long)].collect().sortBy(_._1)
    assert(ch.head._1 == 0L && ch.last._2 == 101L)
    ch.sliding(2).foreach {
      case Array(a, b) => assert(b._1 < a._2, "gap between consecutive windows")
      case _ =>
    }
    assert(ch.forall { case (s, e) => e - s <= 16 && e <= 101 })
    // second-to-last window must NOT already reach the end (minimality)
    if (ch.length > 1) assert(ch(ch.length - 2)._2 < 101L)
  }

  test("sentenceChunks: greedy fill, oversize sentences stand alone, blanks dropped") {
    // budget 5 tokens: [3] + [2] fill chunk 0; [4] opens chunk 1;
    // a 7-token sentence is its own oversize chunk 2; tail [1] chunk 3
    val text = "one two three. four five! " +
      "six seven eight nine? " +
      "a b c d e f g. " +
      "tail."
    val df = Seq((1L, text), (2L, "...!!!")).toDF("doc_id", "text") // doc 2: no sentences
    val got = Chunking.sentenceChunks(df, "doc_id", "text", maxTokens = 5)
      .orderBy("doc", "chunk_idx")
      .select($"doc", $"chunk_idx", $"n_sentences", $"n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 2L, 5L), (1L, 1L, 1L, 4L), (1L, 2L, 1L, 7L), (1L, 3L, 1L, 1L)),
      got.toString)
  }

  test("sentenceChunks is invariant under repartitioning") {
    val docs = graft.core.Tables.documents(spark, sf)
    val a = Chunking.sentenceChunks(docs.repartition(1), "doc_id", "text", 32)
      .orderBy("doc", "chunk_idx").as[(Long, Long, Long, Long)].collect().toSeq
    val b = Chunking.sentenceChunks(docs.repartition(9), "doc_id", "text", 32)
      .orderBy("doc", "chunk_idx").as[(Long, Long, Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
