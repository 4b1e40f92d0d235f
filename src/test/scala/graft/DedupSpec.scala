package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // near-dup of 0
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup of 0
    (4L, "totally different words with no overlap whatsoever at all ok")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val out = Dedup.exact(corpus, md5($"text"), "doc_id")
    assert(out.count() == 4)
    val dup = out.filter($"n_copies" === 2).head()
    assert(dup.getAs[Long]("keep_id") == 0L)
  }

  test("ngram Jaccard finds the near-dup and exact-dup pairs only") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", k = 3, threshold = 0.5)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("minhash LSH: identical docs always collide; reported pairs are exact-verified") {
    val exact = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", k = 3, threshold = 0.6)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    val lshPairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
      k = 3, numPerms = 16, rowsPerBand = 4, threshold = 0.6)
    val lsh = lshPairs.select($"da", $"db").as[(Long, Long)].collect().toSet
    // LSH candidates are a subset of the exact pairs after verification
    assert(lsh.subsetOf(exact))
    // identical shingle sets → identical signatures → every band
    // collides: the exact-dup pair is guaranteed, with est == exact == 1
    val full = lshPairs.filter($"da" === 0 && $"db" === 3).head()
    assert(full.getAs[Double]("est_jaccard") == 1.0)
    assert(full.getAs[Double]("jaccard") == 1.0)
  }

  test("minhash LSH recall on the real corpus' planted near-dups (j ≥ 0.9)") {
    val docs = graft.core.Tables.documents(spark, sf)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 5, threshold = 0.9)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      k = 5, numPerms = 16, rowsPerBand = 4, threshold = 0.9)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact, s"missed ${exact -- lsh}, spurious ${lsh -- exact}")
  }

  test("simhash: identical docs collide at hamming 0; unrelated docs don't pair") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3, numBands = 4)
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"), r.getAs[Int]("hamming")))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 3L && p._3 == 0))
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L))
  }

  test("shingleIndex stop-shingle cutoff drops high-document-frequency shingles") {
    val many = spark.range(0, 50).selectExpr("id AS doc_id",
      "'common shingle text here okay' AS text")
      .unionByName(Seq((100L, "rare unique words appear once here")).toDF("doc_id", "text"))
    val full = Dedup.shingleIndex(many, "doc_id", "text", 3)
    val cut = Dedup.shingleIndex(many, "doc_id", "text", 3, maxDocFreq = 5)
    assert(full.count() > cut.count())
    assert(cut.filter($"doc" === 100L).count() == 4) // rare doc untouched (6 tokens → 4 3-shingles)
    assert(cut.filter($"doc" =!= 100L).count() == 0) // stop-shingles gone
  }

  test("incremental near-dup: batch-vs-corpus and batch-internal pairs only") {
    val corpusDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
      (3L, "completely different content about deep sea fishing vessels here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),  // dup of 1 (and near 2)
      (11L, "unrelated brand new text that matches nothing in the corpus at all"),
      (12L, "unrelated brand new text that matches nothing in the corpus at all!") // near-dup of 11
    ).toDF("doc_id", "text")
    val idx = Dedup.buildIndex(corpusDocs, "doc_id", "text", k = 3,
      numPerms = 16, rowsPerBand = 4)
    val pairs = Dedup.incrementalNearDups(batch, idx, "doc_id", "text",
        k = 3, numPerms = 16, rowsPerBand = 4, threshold = 0.5)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    // every reported pair involves a NEW doc on the da side
    assert(pairs.forall { case (da, _) => da >= 10L }, s"got $pairs")
    // the corpus-internal near-dup (1, 2) is NOT re-reported
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 1L)))
    assert(pairs.contains((10L, 1L)))   // batch vs corpus
    assert(pairs.contains((11L, 12L)))  // batch-internal
  }

  test("decontamination: eval-matching training docs removed, the rest survive") {
    val evalSet = Seq(
      (1L, "what is the capital of timor leste answer dili of course"),
      (2L, "completely unrelated benchmark question about ocean currents")
    ).toDF("doc_id", "text")
    val train = Seq(
      (10L, "what is the capital of timor leste answer dili of course"), // leak
      (11L, "an innocuous training document about fishing boats and nets"),
      (12L, "another clean training document with plenty of fresh words")
    ).toDF("doc_id", "text")
    val idx = Dedup.buildIndex(evalSet, "doc_id", "text", k = 3,
      numPerms = 16, rowsPerBand = 4)
    val survivors = Dedup.decontaminate(train, idx, "doc_id", "text",
        k = 3, numPerms = 16, rowsPerBand = 4, threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(survivors == Set(11L, 12L), s"got $survivors")
  }

  test("contaminationSpans localizes a planted benchmark quote") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    // doc 1: 10 clean tokens, then the quote, then clean tail;
    // doc 2: fully unrelated
    val prefix = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, s"$prefix the quick brown fox jumps over the lazy dog tonight and more"),
      (2L, "completely unrelated content with no shared phrasing at all here"))
      .toDF("doc_id", "text")
    val out = Dedup.contaminationSpans(corpus, bench, "doc_id", "text")
      .select($"doc", $"n_matched", $"first_pos", $"last_pos")
      .as[(Long, Long, Int, Int)].collect().toMap2
    assert(!out.contains(2L), "clean doc must not be flagged")
    val (_, first, last) = out(1L)
    // the quote starts at token 10; matched window starts must sit
    // inside the quote region (10 .. 10+quoteTokens-1)
    assert(first >= 10 && last <= 10 + 10 - 1, s"span [$first, $last]")
  }

  test("removeContaminatedSpans excises the quote, keeps the clean frame") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val prefix = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, s"$prefix the quick brown fox jumps over the lazy dog tonight and more"),
      (2L, "completely unrelated content with no shared phrasing at all here"))
      .toDF("doc_id", "text")
    val out = Dedup.removeContaminatedSpans(corpus, bench, "doc_id", "text")
      .select($"doc", $"n_kept", $"n_removed", $"clean_text")
      .as[(Long, Long, Long, String)].collect()
    assert(out.map(_._1).toSeq == Seq(1L), "only the flagged doc is repaired")
    val (_, nKept, nRemoved, clean) = out.head
    assert(nKept + nRemoved == 22L, "tokens conserved")
    assert(nRemoved >= 8L, s"the quote body must go (removed $nRemoved)")
    assert(clean.startsWith("alpha beta gamma"), clean)
    assert(!clean.contains("quick brown fox"), clean)
  }

  test("selfSpanDedup: keep-first excision of repeated spans") {
    // doc 11 repeats doc 10's first 8 tokens verbatim mid-text; doc 12
    // is an exact copy of doc 10; doc 13 shares nothing.
    val d10 = "a b c d e f g h i j k l"
    val docs = Seq(
      (10L, d10),
      (11L, s"x1 x2 x3 a b c d e f g h x4 x5"),
      (12L, d10),
      (13L, "p q r s t u v w aa bb cc dd"))
      .toDF("doc_id", "text")
    val out = Dedup.selfSpanDedup(docs, "doc_id", "text", n = 8)
      .select($"doc", $"n_tokens", $"n_removed", $"clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // canonical doc survives untouched
    assert(out(10L) == ((12L, 0L, d10)))
    // the verbatim copy is fully erased (every 8-gram is non-canonical)
    assert(out(12L)._2 == 12L && out(12L)._3 == "")
    // the embedded repeat loses exactly the 8 borrowed positions
    assert(out(11L) == ((13L, 8L, "x1 x2 x3 x4 x5")))
    // untouched doc passes through
    assert(out(13L) == ((12L, 0L, "p q r s t u v w aa bb cc dd")))
  }

  test("selfSpanDedup: within-doc repetition keeps the first run") {
    val rep = "m1 m2 m3 m4 m5 m6 m7 m8"
    val docs = Seq((1L, s"$rep z1 z2 $rep")).toDF("doc_id", "text")
    val out = Dedup.selfSpanDedup(docs, "doc_id", "text", n = 8)
      .select($"clean_text").as[String].head()
    assert(out == s"$rep z1 z2", out)
  }

  test("incrementalSpanDedup: batch cleaned against landed index + itself") {
    val landed = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val idx = Dedup.spanGramIndex(landed, "doc_id", "text", n = 8)
    // doc 20 re-uses the landed span; doc 21 repeats doc 20's fresh
    // tail?  no — fresh spans must dedup only within the batch
    val batch = Seq(
      (20L, "x1 x2 a b c d e f g h x3"),          // landed span excised
      (21L, "n1 n2 n3 n4 n5 n6 n7 n8 tail1"),     // fresh, first in batch
      (22L, "n1 n2 n3 n4 n5 n6 n7 n8 tail2"))     // batch-repeat excised
      .toDF("doc_id", "text")
    val out = Dedup.incrementalSpanDedup(batch, idx, "doc_id", "text", n = 8)
      .select($"doc", $"n_removed", $"clean_text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(20L) == ((8L, "x1 x2 x3")), "landed span must be excised")
    assert(out(21L) == ((0L, "n1 n2 n3 n4 n5 n6 n7 n8 tail1")),
      "batch-first fresh span survives")
    assert(out(22L) == ((8L, "tail2")), "batch repeat is excised")
  }

  test("editDistanceNearDups: single-char edit verified exactly, reorders and far docs rejected") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("charlie", "charlee")),                // one substitution
      (3L, "juliet india hotel golf foxtrot echo delta charlie bravo alpha"), // same vocab, reordered: shares no 5-shingle
      (4L, "totally different words that never overlap with the others at all"),
      (5L, base + " kilo lima mike november oscar papa quebec romeo sierra tango uniform victor")
    ).toDF("doc_id", "text")
    val pairs = Dedup.editDistanceNearDups(docs, "doc_id", "text", k = 5, maxDist = 8)
      .select($"da", $"db", $"dist").as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 1)),
      s"only the 1-edit pair must survive (reorder shares no shingle, " +
      s"the long doc fails the length band): $pairs")
  }

  test("editDistanceNearDups: length band is exact (gap > maxDist implies dist > maxDist)") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j " + ("pad " * 10)))
      .toDF("doc_id", "text")
    // pair shares shingles but the 40-char length gap exceeds maxDist=8,
    // so the band prunes it WITHOUT running levenshtein — and that prune
    // is lossless because lev >= |len gap| > 8
    val pairs = Dedup.editDistanceNearDups(docs, "doc_id", "text", k = 5, maxDist = 8)
    assert(pairs.count() == 0)
  }

  test("editDistanceNearDups is deterministic under repartitioning") {
    val docs = (1L to 60L).map { i =>
      val t = s"w${i % 7} common tokens run here for doc body ${i % 5} tail"
      (i, if (i % 2 == 0) t else t + "!")
    }.toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.editDistanceNearDups(df, "doc_id", "text", k = 3, maxDist = 8)
        .select($"da", $"db", $"dist").as[(Long, Long, Int)].collect().toSet
    assert(run(docs) == run(docs.repartition(11)))
  }

  private implicit class M(rows: Array[(Long, Long, Int, Int)]) {
    def toMap2: Map[Long, (Long, Int, Int)] =
      rows.map { case (d, n, f, l) => d -> ((n, f, l)) }.toMap
  }

  test("lshPlan: factorizations complete, areas non-negative, winners grow selective") {
    val plan = Dedup.lshPlan(spark, 64, Seq(50, 60, 70, 80)).collect()
    assert(plan.length == 7 * 4) // 7 divisor pairs × 4 thresholds
    plan.foreach { r =>
      assert(r.getAs[Int]("b") * r.getAs[Int]("r") == 64)
      assert(r.getAs[Long]("fp_e9") >= 0 && r.getAs[Long]("fn_e9") >= 0)
    }
    val winners = plan.filter(_.getAs[Long]("rn") == 1L)
      .map(r => r.getAs[Int]("t_pct") -> ((r.getAs[Int]("b"), r.getAs[Int]("r"))))
      .toMap
    // S-curve midpoint ≈ (1/b)^(1/r): tighter thresholds need more rows
    // per band; the exact winners are pinned (integer areas, no drift)
    assert(winners == Map(50 -> ((16, 4)), 60 -> ((8, 8)),
      70 -> ((8, 8)), 80 -> ((4, 16))))
  }

  test("containmentPairs: an embedded excerpt scores containment 1.0 where Jaccard sees nothing") {
    val parent = (1 to 40).map(i => s"w$i").mkString(" ")      // 36 5-shingles
    val excerpt = (1 to 9).map(i => s"w$i").mkString(" ")      // 5 of them
    val docs = Seq((1L, parent), (2L, excerpt),
      (3L, "unrelated text with completely different vocabulary ok fine")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", k = 5, threshold = 0.9)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(got.length == 1)
    val (da, db, common, na, nb, ca, cb) = got.head
    assert((da, db) == (1L, 2L) && common == 5L && na == 36L && nb == 5L)
    assert(cb == 1.0, "excerpt fully contained")
    assert(ca == 5.0 / 36.0)
    // the symmetric measure would have rejected this pair outright
    val jac = common.toDouble / (na + nb - common)
    assert(jac < 0.15, s"jaccard $jac should be tiny")
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 5, threshold = 0.6)
      .isEmpty, "sanity: symmetric Jaccard at a usable threshold misses the pair")
  }

  test("containmentPairs: threshold filters on the BEST direction; unrelated pairs absent") {
    val docs = Seq(
      (1L, "a b c d e f g h"),        // 4 shingles
      (2L, "a b c d e x y z"),        // shares 1 shingle with 1 -> containment 0.25
      (3L, "p q r s t u v w")).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(docs, "doc_id", "text", k = 5, threshold = 0.9).isEmpty)
    val loose = Dedup.containmentPairs(docs, "doc_id", "text", k = 5, threshold = 0.2)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(loose.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L)))
  }
}
