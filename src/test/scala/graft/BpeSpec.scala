package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe

/** BPE tokenizer training: merge election and rewrite semantics on a
  * hand-computed fixture, census/loop agreement, encode determinism. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich-style fixture. Iteration-0 pair counts (weighted, overlaps
  // included): es 6+3+1=10, st 6+3+1=10, ne 6+3=9, ew 6+3=9,
  // we 2+6+1=9, lo 7, ow 7, wi/id/de/ws 3, er 2.
  private val wf = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
    ("west", 1L), ("news", 3L))

  test("trainMerges: hand-computed election order and rewrites") {
    val merges = Bpe.trainMerges(wf, nMerges = 4)
    assert(merges.map(m => (m.rank, m.left, m.right, m.freq)) == Seq(
      (1, "e", "s", 10L),  // ties with (s,t); lexicographic election
      (2, "es", "t", 10L),
      (3, "e", "w", 9L),   // merge 1 consumed 'we' in newest/west;
                           // (e,w) vs (n,e) tie → 'e' < 'n'
      (4, "n", "ew", 9L)))
  }

  test("trainMerges: tie-break is lexicographic and training is deterministic; loop stops when fully merged") {
    // all pairs freq 1 → lexicographically smallest pair wins
    val m1 = Bpe.trainMerges(Seq(("ba", 1L), ("ab", 1L)), 1)
    assert(m1.map(m => (m.left, m.right)) == Seq(("a", "b")))
    // a 2-char word exhausts after 1 merge; the loop must stop early
    val all = Bpe.trainMerges(Seq(("ab", 3L)), 10)
    assert(all.map(m => (m.left, m.right, m.freq)) == Seq(("a", "b", 3L)))
  }

  test("pairCensus agrees with the loop's iteration-0 counts") {
    val census = Bpe.pairCensus(wf.toDF("token", "cnt"))
      .as[(String, Long)].collect().toMap
    assert(census("e s") == 10L && census("s t") == 10L &&
      census("n e") == 9L && census("l o") == 7L && census("w e") == 9L)
    // single-char / empty words contribute nothing
    val none = Bpe.pairCensus(Seq(("x", 9L), ("", 4L)).toDF("token", "cnt"))
    assert(none.count() == 0)
  }

  test("encodeStats: learned merges compress counts; unmerged text stays at character count; deterministic") {
    val merges = Bpe.trainMerges(wf, 4)
    val docs = Seq(
      (1L, "newest newest"),
      (2L, "zq"),            // no learned pair applies → 2 chars
      (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val enc = Bpe.encodeStats(docs, "text", merges)
      .select("doc_id", "n_words", "n_bpe_tokens")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    // newest: e+s→es, es+t→est, e+w→ew, n+ew→new ⇒ [new, est] = 2/word
    assert(enc(1L) == ((1L, 2L, 4L)))
    assert(enc(2L) == ((2L, 1L, 2L)))
    assert(enc(3L) == ((3L, 0L, 0L)))
    assert(enc(4L) == ((4L, 0L, 0L)))
    val again = Bpe.encodeStats(docs.repartition(5), "text", merges)
      .select("doc_id", "n_words", "n_bpe_tokens")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == enc.values.toSet)
  }

  test("fertilityCensus: trained-language words compress, untouched script stays at char fertility") {
    val merges = Bpe.trainMerges(wf, 4)
    val docs = Seq(
      (1L, "en", "newest newest newest"), // 3 words → 6 tokens, 20 chars
      (2L, "xx", "zzzz qqqq"))            // no merges apply: 2 words → 8 tokens
      .toDF("doc_id", "lang", "text")
    val census = Bpe.fertilityCensus(docs, "text", col("lang"), merges)
      .select("group", "n_words", "n_bpe_tokens", "n_chars", "fertility")
      .as[(String, Long, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(census("en") == (("en", 3L, 6L, 20L, 2.0)))
    assert(census("xx") == (("xx", 2L, 8L, 9L, 4.0)))
  }

  test("tokenizer feeds packing: encodeStats token counts drive packFirstFit with conservation") {
    val merges = Bpe.trainMerges(wf, 4)
    val docs = (0 until 30).map(i =>
      (i.toLong, Seq.fill(i % 5 + 1)("newest").mkString(" ")))
      .toDF("doc_id", "text")
    val counted = Bpe.encodeStats(docs, "text", merges)
    val packed = graft.text.Packing.packFirstFit(
      counted, "doc_id", "n_bpe_tokens", capacity = 8L, nShards = 2)
    // token conservation through the chain
    val totIn = counted.agg(sum("n_bpe_tokens")).head().getLong(0)
    val totOut = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(totIn == totOut && totIn > 0)
    // no-straddle invariant holds on tokenizer-derived counts
    val bad = packed.filter(!col("oversize") &&
      col("offset") + col("n_tokens") > 8).count()
    assert(bad == 0)
  }

  test("learn: end-to-end over a DataFrame corpus matches driver-side training on its census") {
    val docs = wf.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val learned = Bpe.learn(docs, "text", topV = 100, nMerges = 4)
    assert(learned == Bpe.trainMerges(wf, 4))
    val table = Bpe.mergesTable(spark, learned)
    assert(table.columns.toSeq == Seq("rank", "left", "right", "freq"))
    assert(table.count() == 4)
  }

  // --- declarative encoder (applyMergesCol) ---

  /** Reference priority-BPE: repeatedly merge all left-to-right
    * non-overlapping occurrences of the LOWEST-RANK pair present. */
  private def bpeRef(word: String, merges: Seq[(String, String)]): Vector[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      val present = syms.indices.dropRight(1)
        .flatMap(i => rank.get((syms(i), syms(i + 1))))
      if (present.isEmpty) done = true
      else {
        val (a, b) = merges(present.min)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  private val fixedMerges = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r",
    "a" -> "n", "o" -> "n", "r" -> "e", "a" -> "t")

  test("applyMergesCol: hand cases — chained replaces follow merge rank order") {
    val out = Seq((1L, "there then that in on matter"))
      .toDF("doc_id", "text")
      .select(Bpe.applyMergesCol($"text", fixedMerges).as("s"))
      .as[String].head()
    // there → the|re; then → th|e|n (e consumed by 'the'? no: t+h, th+e → the, n)
    assert(out == "|the||re| |the||n| |th||at| |in| |on| |m||at||t||er|")
  }

  test("applyMergesCol token counts equal priority BPE on real corpus words") {
    val docs = graft.core.Tables.documents(spark, sf).limit(60)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val enc = Seq(docs: _*).toDF("doc_id", "text")
      .withColumn("s", Bpe.applyMergesCol($"text", fixedMerges))
      .withColumn("n_tok",
        ((length($"s") - length(call_function("replace", $"s", lit("|"), lit("")))) / 2)
          .cast("long"))
      .select($"doc_id", $"n_tok").as[(Long, Long)].collect().toMap
    docs.foreach { case (id, text) =>
      val want = "[a-z]+".r.findAllIn(text)
        .map(w => bpeRef(w, fixedMerges).length.toLong).sum
      assert(enc(id) == want, s"doc $id: chained ${enc(id)} != priority BPE $want")
    }
  }

  test("bpe_counts kernel is bit-identical to the replace-chain spelling on real docs") {
    graft.functions.BpeEncode.register(spark)
    val docs = graft.core.Tables.documents(spark, sf).limit(120)
    val chain = docs
      .withColumn("s", Bpe.applyMergesCol($"text", fixedMerges))
      .select($"doc_id",
        size(call_function("regexp_extract_all", $"text", lit("[a-z]+"), lit(0)))
          .cast("long").as("w"),
        length(regexp_replace($"s", "[| ]", "")).cast("long").as("c"),
        ((length($"s") - length(call_function("replace", $"s", lit("|"), lit("")))) / 2)
          .cast("long").as("t"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val kernel = docs
      .withColumn("k", call_function("bpe_counts", $"text",
        typedlit(fixedMerges.map(_._1)), typedlit(fixedMerges.map(_._2))))
      .select($"doc_id", $"k.n_words", $"k.n_chars", $"k.n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(kernel == chain)
  }

  test("bpe_counts edges: null text, empty text, no-lowercase text, unicode neighbours") {
    graft.functions.BpeEncode.register(spark)
    val rows = Seq((1L, Option("the θthe ドtheド")), (2L, Some("")),
      (3L, Some("UPPER 123 !!!")), (4L, None))
      .toDF("id", "text")
      .withColumn("k", call_function("bpe_counts", $"text",
        typedlit(fixedMerges.map(_._1)), typedlit(fixedMerges.map(_._2))))
      .select($"id", $"k.n_words", $"k.n_tokens")
      .as[(Long, Option[Long], Option[Long])].collect().toMap2
    // multi-byte neighbours don't break [a-z] run detection: 3 'the'
    // words, each encoding to the single token 'the'
    assert(rows(1L) == ((Some(3L), Some(3L))))
    assert(rows(2L) == ((Some(0L), Some(0L))))
    assert(rows(3L) == ((Some(0L), Some(0L))))
    assert(rows(4L) == ((None, None)))
  }

  private implicit class RowsMap(rows: Array[(Long, Option[Long], Option[Long])]) {
    def toMap2: Map[Long, (Option[Long], Option[Long])] =
      rows.map { case (k, a, b) => k -> ((a, b)) }.toMap
  }

  test("requireChainable rejects a merge consuming a symbol produced later") {
    intercept[IllegalArgumentException] {
      // 'bc' is produced by merge 2, consumed by merge 1 → diverges
      Bpe.requireChainable(Seq("a" -> "bc", "b" -> "c"))
    }
    Bpe.requireChainable(fixedMerges) // valid by construction
  }
}
