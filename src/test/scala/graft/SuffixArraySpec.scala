package graft

import graft.text.SuffixArray

/** Prefix-doubling suffix array: the banana closed form, cross-doc
  * identical-suffix ties, truncation window, and a brute-force
  * cross-check against a driver-side suffix sort on pseudo-random
  * multi-doc corpora. */
@org.scalatest.tags.Slow
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(docs: Seq[(Long, String)], maxChars: Int = 1000) =
    SuffixArray.ranks(docs.toDF("doc_id", "text"), "doc_id", "text", maxChars)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("rank")).toMap

  private def brute(docs: Seq[(Long, String)], maxChars: Int = 1000) = {
    val sufs = for {
      (id, t0) <- docs
      t = t0.take(maxChars)
      p <- 1 to t.length
    } yield (id, p.toLong, t.substring(p - 1))
    val order = sufs.map(_._3).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    sufs.map(s => (s._1, s._2) -> order(s._3)).toMap
  }

  test("banana: the textbook suffix order") {
    val got = ranksOf(Seq((1L, "banana")))
    val want = Map((1L, 6L) -> 1L, (1L, 4L) -> 2L, (1L, 2L) -> 3L,
      (1L, 1L) -> 4L, (1L, 5L) -> 5L, (1L, 3L) -> 6L)
    assert(got == want)
  }

  test("identical suffixes across documents share a dense rank") {
    val got = ranksOf(Seq((1L, "ab"), (2L, "xab")))
    // suffixes: ab(1,1) ab(2,2) b(1,2) b(2,3) xab(2,1)
    assert(got((1L, 1L)) == got((2L, 2L)), "equal 'ab' suffixes")
    assert(got((1L, 2L)) == got((2L, 3L)), "equal 'b' suffixes")
    assert(got == brute(Seq((1L, "ab"), (2L, "xab"))))
  }

  test("maxChars truncates the suffix window") {
    val got = ranksOf(Seq((1L, "abcdef")), maxChars = 3)
    assert(got.keySet == Set((1L, 1L), (1L, 2L), (1L, 3L)))
    assert(got == brute(Seq((1L, "abcdef")), maxChars = 3))
  }

  test("matches a brute-force suffix sort on a pseudo-random corpus") {
    val docs = (0L until 12L).map { i =>
      val len = 5 + (i * 7 % 23).toInt
      val s = (0 until len).map(j => ('a' + ((i * 31 + j * j * 7 + j) % 4)).toChar)
        .mkString
      (i, s)
    }
    assert(ranksOf(docs) == brute(docs))
  }

  test("repetitive text (the prefix-doubling stress case) still exact") {
    val docs = Seq((1L, "aaaaaaaaaaaa"), (2L, "aaabaaabaaab"))
    assert(ranksOf(docs) == brute(docs))
  }

  // --- repeatLengths: LCP mining over the array ---

  private def repsOf(docs: Seq[(Long, String)], maxChars: Int = 1000) =
    SuffixArray.repeatLengths(docs.toDF("doc_id", "text"), "doc_id", "text",
        maxChars)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("rep")).toMap

  /** Brute-force repeat length: for each suffix, the longest prefix
    * that occurs as a prefix of ANY OTHER suffix. */
  private def bruteReps(docs: Seq[(Long, String)], maxChars: Int = 1000) = {
    val sufs = for {
      (id, t0) <- docs; t = t0.take(maxChars); p <- 1 to t.length
    } yield (id, p.toLong, t.substring(p - 1))
    sufs.map { case (id, p, s) =>
      val best = sufs.collect { case (i2, p2, s2) if (i2, p2) != (id, p) =>
        s.zip(s2).takeWhile { case (a, b) => a == b }.length
      }
      (id, p) -> (if (best.isEmpty) 0L else best.max.toLong)
    }.toMap
  }

  test("planted shared span: exact maximal repeat lengths at every offset") {
    // 'needleinhay' (len 11) planted in two otherwise-disjoint docs:
    // at span offset i the suffix's shared prefix is the REMAINING
    // span (11 - i chars) — the exact ramp a fixed-k-gram pass (q138's
    // Dedup.selfSpanDedup) cannot see: k-grams witness length-k
    // repeats only, never each position's true maximal repeat.
    val docs = Seq((1L, "xqzvneedleinhaywmfc"), (2L, "rjkneedleinhaytubol"))
    val got = repsOf(docs)
    val spanAt1 = 5 // 1-based start of the span in doc 1
    val spanAt2 = 4 // ... in doc 2 (after the 3-char "rjk" prefix)
    (0 until 11).foreach { i =>
      assert(got((1L, (spanAt1 + i).toLong)) >= 11L - i,
        s"doc1 offset $i: repeat must cover the remaining span")
      assert(got((2L, (spanAt2 + i).toLong)) >= 11L - i)
    }
    assert(got == bruteReps(docs))
  }

  test("repeat lengths match brute force on a pseudo-random corpus") {
    val docs = (0L until 10L).map { i =>
      val len = 4 + (i * 11 % 19).toInt
      (i, (0 until len).map(j => ('a' + ((i * 13 + j * 5 + j * j) % 3)).toChar)
        .mkString)
    }
    assert(repsOf(docs) == bruteReps(docs))
  }

  test("no shared prefixes anywhere -> all repeat lengths zero") {
    val got = repsOf(Seq((1L, "abc"), (2L, "def")))
    // distinct alphabets: only suffix pairs with empty common prefix
    assert(got.values.forall(_ == 0L))
  }

  // --- prefixRuns: the segmented-scan run grouping ---

  private def runsOf(docs: Seq[(Long, String)], minLen: Int,
                     parts: Int = 1) =
    SuffixArray.prefixRuns(
      docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text",
      maxChars = 1000, minLen = minLen)
      .collect()
      .map(r => (r.getAs[Long]("doc"), r.getAs[Long]("pos")) ->
        (Option(r.getAs[Any]("prev_lcp")).map(_.asInstanceOf[Long]),
          r.getAs[Boolean]("boundary"), r.getAs[Long]("run_id")))
      .toMap

  /** Sequential reference walk over the brute-force suffix order. */
  private def bruteRuns(docs: Seq[(Long, String)], minLen: Int) = {
    val sufs = (for {
      (id, t) <- docs; p <- 1 to t.length
    } yield (id, p.toLong, t.substring(p - 1)))
      .sortBy { case (id, p, s) => (s, id, p) }
    var runId = 0L
    var prev: String = null
    sufs.map { case (id, p, s) =>
      val lcp = if (prev == null) None
      else Some(s.zip(prev).takeWhile { case (a, b) => a == b }.length.toLong)
      val boundary = lcp.forall(_ < minLen)
      if (boundary) runId += 1
      prev = s
      (id, p) -> (lcp, boundary, runId)
    }.toMap
  }

  test("prefixRuns groups shared-span occurrences; matches the sequential walk") {
    val docs = Seq((1L, "xqzvneedleinhaywmfc"), (2L, "rjkneedleinhaytubol"))
    val got = runsOf(docs, minLen = 5)
    assert(got == bruteRuns(docs, minLen = 5))
    // the two span-start suffixes share a run; the doc-1 tail after
    // the span does not join it
    assert(got((1L, 5L))._3 == got((2L, 4L))._3)
    assert(got((1L, 16L))._3 != got((1L, 5L))._3)
  }

  private def extendOf(landed: Seq[(Long, String)], batch: Seq[(Long, String)],
                       parts: Int = 4, maxChars: Int = 1000) = {
    val idx = SuffixArray.index(
      landed.toDF("doc_id", "text").repartition(parts), "doc_id", "text", maxChars)
    SuffixArray.extendRanks(idx,
        batch.toDF("doc_id", "text").repartition(parts), "doc_id", "text", maxChars)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")) ->
        (r.getAs[Long]("rank"), r.getAs[Boolean]("is_new"))).toMap
  }

  test("extendRanks: merge == rebuild, including cross-class duplicate suffixes") {
    val landed = Seq((1L, "banana"), (2L, "bandana"))
    val batch = Seq((3L, "anaconda"), (4L, "banana")) // doc 4 duplicates doc 1
    val want = brute(landed ++ batch)
    val got = extendOf(landed, batch)
    assert(got.view.mapValues(_._1).toMap == want)
    assert(got.forall { case ((d, _), (_, isNew)) => isNew == (d >= 3L) })
  }

  test("extendRanks: batch-only strings above, below, and between landed ranks") {
    // landed covers the middle of the alphabet; batch inserts at both
    // ends and interleaves
    val landed = Seq((1L, "mmnn"))
    val batch = Seq((2L, "aazz"), (3L, "mz"))
    val got = extendOf(landed, batch).view.mapValues(_._1).toMap
    assert(got == brute(landed ++ batch))
  }

  test("extendRanks: empty landed index ranks the batch alone") {
    val got = extendOf(Seq.empty, Seq((1L, "abcab"))).view.mapValues(_._1).toMap
    assert(got == brute(Seq((1L, "abcab"))))
  }

  test("extendRanks is partitioning-invariant") {
    val landed = (0L until 6L).map(i =>
      (i, (0 until 15).map(j => ('a' + ((i * 7 + j * 3) % 4)).toChar).mkString))
    val batch = (6L until 9L).map(i =>
      (i, (0 until 12).map(j => ('a' + ((i * 11 + j * 5) % 4)).toChar).mkString))
    val want = brute(landed ++ batch)
    Seq(1, 3, 16).foreach { p =>
      val got = extendOf(landed, batch, parts = p).view.mapValues(_._1).toMap
      assert(got == want, s"diverged at $p partitions")
    }
  }

  test("extendOrRebuild: big batch takes the rebuild arm, ranks unchanged") {
    val landed = Seq((1L, "ab"))
    val batch = Seq((2L, "zzzzyyyyxxxx"), (3L, "qqqq")) // >> 0.5 * landed mass
    val idx = SuffixArray.index(landed.toDF("doc_id", "text"), "doc_id", "text", 1000)
    val got = SuffixArray.extendOrRebuild(idx, landed.toDF("doc_id", "text"),
        batch.toDF("doc_id", "text"), "doc_id", "text", 1000)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("rank")).toMap
    assert(got == brute(landed ++ batch))
  }

  test("prefixRuns is partitioning-invariant (seam carries stitch exactly)") {
    val docs = (0L until 8L).map { i =>
      (i, (0 until 12 + (i % 5).toInt)
        .map(j => ('a' + ((i * 13 + j * 5 + j * j) % 3)).toChar).mkString)
    }
    val want = bruteRuns(docs, minLen = 3)
    // 1, 3 and 16 partitions (16 > #suffix groups in places -> empty
    // partitions exercise the stitch's skip path)
    Seq(1, 3, 16).foreach { p =>
      assert(runsOf(docs, minLen = 3, parts = p) == want,
        s"diverged at $p partitions")
    }
  }
}
