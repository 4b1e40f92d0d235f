package graft

import graft.operators.ChangePoint
import graft.text.{Bpe, SuffixArray}
import org.apache.spark.sql.functions._

/** Round-11 latent-edge audit — the audit class that has caught a real
  * bug three rounds running, pointed this round at the r10 kernels:
  * BPE encode on supplementary characters and empty merge tables, the
  * incremental suffix array at the exact rebuild threshold and on an
  * empty batch, CUSUM on degenerate series, KLL capacity edges, and
  * IVF probes into empty cells. */
class Round11AuditSpec extends SparkSpec {
  import spark.implicits._

  // ---- Bpe.encodeStats ----

  test("encodeStats with an EMPTY merge table counts one token per char") {
    val df = Seq((1L, "ab cde"), (2L, ""), (3L, null: String), (4L, "  "))
      .toDF("id", "text")
    val got = Bpe.encodeStats(df, "text", Seq.empty)
      .select($"id", $"n_words", $"n_bpe_tokens").as[(Long, Long, Long)]
      .collect().map { case (id, w, t) => id -> ((w, t)) }.toMap
    assert(got(1L) == ((2L, 5L))) // "ab"→2 chars, "cde"→3
    assert(got(2L) == ((0L, 0L)) && got(3L) == ((0L, 0L)) && got(4L) == ((0L, 0L)))
  }

  test("encodeStats splits supplementary chars into surrogate Chars " +
    "CONSISTENTLY with trainMerges (train/encode round-trip merges them back)") {
    // U+1F600 is two Java Chars; both trainer and encoder split by Char,
    // so a surrogate half is a learnable merge side like any other
    val word = "a😀b" // 4 Chars → 4 base symbols
    def nTokens(merges: Seq[Bpe.Merge]): Long =
      Bpe.encodeStats(Seq((1L, word)).toDF("id", "text"), "text", merges)
        .select($"n_bpe_tokens").as[Long].head()
    assert(nTokens(Seq.empty) == 4L)
    // each learned merge removes exactly one symbol (consistent Char
    // split on both sides); three merges fuse the whole word
    val m = Bpe.trainMerges(Seq((word, 10L)), nMerges = 3)
    assert(m.map(_.rank) == Seq(1, 2, 3))
    assert(nTokens(m.take(1)) == 3L)
    assert(nTokens(m) == 1L)
    // and the lone high surrogate does appear as a merge side (ints, so
    // no raw surrogate ever reaches the test report's XML encoder)
    assert(m.flatMap(x => x.left + x.right).map(_.toInt).contains(0xD83D))
  }

  // ---- SuffixArray.extendRanks / extendOrRebuild ----

  private def saRanks(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")) ->
      r.getAs[Long]("rank")).toMap

  test("extendRanks with an EMPTY new-docs batch returns the landed ranks unchanged") {
    val landed = Seq((1L, "banana"), (2L, "band")).toDF("doc_id", "text")
    val idx = SuffixArray.index(landed, "doc_id", "text", 1000)
    val got = SuffixArray.extendRanks(idx,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", 1000)
    val want = saRanks(SuffixArray.ranks(landed, "doc_id", "text", 1000))
    assert(saRanks(got) == want)
    assert(got.filter(col("is_new")).count() == 0)
  }

  test("extendOrRebuild at EXACTLY the threshold boundary equals the rebuild") {
    // batch mass == rebuildFraction * landed mass → the <= takes the
    // extend arm; merge ≡ rebuild must make the switch unobservable
    val landed = Seq((1L, "abcdefgh")).toDF("doc_id", "text") // mass 8
    val batch = Seq((2L, "zyxw")).toDF("doc_id", "text")      // mass 4 = 0.5·8
    val idx = SuffixArray.index(landed, "doc_id", "text", 1000)
    val got = SuffixArray.extendOrRebuild(idx, landed, batch,
      "doc_id", "text", 1000, rebuildFraction = 0.5)
    val want = saRanks(SuffixArray.ranks(
      landed.unionByName(batch), "doc_id", "text", 1000))
    assert(saRanks(got) == want)
  }

  test("extendOrRebuild with BOTH sides empty yields an empty frame") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val idx = SuffixArray.index(empty, "doc_id", "text", 1000)
    assert(SuffixArray.extendOrRebuild(idx, empty, empty,
      "doc_id", "text", 1000).count() == 0)
  }

  // ---- ChangePoint.cusum ----

  test("cusum on an all-equal series scores 0 and breaks the tie to the first row") {
    val df = (1 to 6).map(i => (i.toLong, 42L)).toDF("i_ord", "v")
    val r = ChangePoint.cusum(df, "i_ord", "v").collect()(0)
    assert(r.getAs[Long]("i_ord") == 1L)
    assert(r.getAs[Double]("score") == 0.0)
    assert(r.getAs[Long]("mean_before") == 42L)
    assert(r.getAs[Long]("mean_after") == 42L) // n > i at the first row
  }

  test("cusum on a single-row series returns that row with a null mean_after") {
    val r = ChangePoint.cusum(Seq((7L, 13L)).toDF("i_ord", "v"), "i_ord", "v")
      .collect()(0)
    assert(r.getAs[Long]("i_ord") == 7L && r.getAs[Long]("i") == 1L &&
      r.getAs[Long]("n") == 1L)
    assert(r.getAs[Double]("score") == 0.0)
    assert(r.getAs[Long]("mean_before") == 13L && r.isNullAt(r.fieldIndex("mean_after")))
  }

  test("cusum with duplicate ordCol values is deterministic across partitionings") {
    val rows = Seq((1L, 5L), (2L, 9L), (2L, 1L), (2L, 9L), (3L, 50L), (3L, 60L))
    val runs = Seq(1, 3, 8).map { p =>
      ChangePoint.cusum(rows.toDF("i_ord", "v").repartition(p), "i_ord", "v")
        .collect()(0).toSeq
    }
    assert(runs.distinct.size == 1, s"diverged: $runs")
  }

  // ---- KLL capacity edges ----

  test("kll odd capacity rounds up to the next even cap (5 ≡ 6), min cap works") {
    graft.functions.KllAlgebra.register(spark)
    val vals = (1 to 200).map(i => ((i * 37) % 200).toDouble)
    vals.toDF("v").createOrReplaceTempView("kll_edge")
    def p50(cap: Int): Double = spark.sql(
      s"SELECT kll_value(kll_state(v, $cap), 0.5) FROM kll_edge")
      .head().getDouble(0)
    assert(p50(5) == p50(6))
    // cap 4 (the minimum): deep compaction cascade still answers within
    // the KLL rank bound (generous envelope for n=200, cap=4)
    assert(math.abs(p50(4) - 99.5) <= 60.0)
    // exact regime sanity at a roomy cap
    assert(p50(1024) == 99.5)
  }

  test("kll over only-null input: n = 0 and a null quantile, not a crash") {
    graft.functions.KllAlgebra.register(spark)
    Seq[Option[Double]](None, None).toDF("v")
      .createOrReplaceTempView("kll_nulls")
    val r = spark.sql(
      "SELECT kll_n(kll_state(v, 8)) AS n, kll_value(kll_state(v, 8), 0.5) AS q " +
        "FROM kll_nulls").head()
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  // ---- IVF empty-cell probes ----

  test("IVF extendAndSearch: a query probing only EMPTY cells returns no rows " +
    "(bounded recall loss, not an error); all-one-cell batches still search") {
    import graft.similarity.Ivf
    // landed corpus clusters near (1,0) and (0,1); batch lands entirely
    // in the (1,0) cell; the far query probes 1 cell
    val landed = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f))
    ).toDF("id", "vec")
    val batch = Seq((10L, Array(0.95f, 0.05f)), (11L, Array(0.97f, 0.02f)))
      .toDF("id", "vec")
    val queries = Seq((100L, Array(0.96f, 0.04f))).toDF("id", "vec")
    val got = Ivf.extendAndSearch(landed, batch, queries,
      "id", "vec", k = 3, nLists = 2, nProbe = 1)
    val nids = got.select($"nid").as[Long].collect().toSet
    assert(nids.nonEmpty && nids.subsetOf(Set(1L, 2L, 10L, 11L)),
      s"probe leaked outside the assigned cell: $nids")
  }
}
