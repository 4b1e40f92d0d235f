package graft

import graft.operators.{Nest, Salting}
import graft.stats.Outliers
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5 plan): nest/unnest round-trip identity,
  * MAD-bound monotonicity in k, salted-aggregation equivalence, and
  * version-string ordering. Raw ScalaCheck generators with fixed seeds
  * (the scalatest bridge isn't available offline); Spark round-trips
  * run a handful of generated cases — each case is a real plan. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic samples from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(Int, Int, String)]] =
    Gen.chooseNum(1, 25).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.chooseNum(0, 4)
        ord <- Gen.chooseNum(0, 1000)
        v <- Gen.alphaStr.map(_.take(6))
      } yield (k, ord, v))
    }

  test("property: nest → unnest is the identity on row multisets") {
    samples(rowsGen, 5).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("k", "ord", "v")
      val back = Nest.unnest(
        Nest.nest(df, Seq("k"), Seq("ord", "v"), "ord", "items"), "items")
      val a = df.select("k", "ord", "v").as[(Int, Int, String)].collect().sorted.toSeq
      val b = back.select("k", "ord", "v").as[(Int, Int, String)].collect().sorted.toSeq
      assert(a == b)
    }
  }

  test("property: MAD bounds widen monotonically in k") {
    val df = Seq.tabulate(40)(i => ("g", 5.0 + (i % 13) * 1.7)).toDF("g", "x")
    val bounds = Seq(1.0, 2.0, 3.0, 5.0).map { k =>
      val r = Outliers.madBoundsLog1p(df, Seq("g"), "x", k).head()
      (r.getAs[Double]("lower"), r.getAs[Double]("upper"))
    }
    bounds.sliding(2).foreach { case Seq((lo1, hi1), (lo2, hi2)) =>
      assert(lo2 <= lo1 && hi2 >= hi1, s"bounds must widen with k: $bounds")
    }
  }

  test("property: salted aggregation equals direct aggregation") {
    val df = graft.core.Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity", $"l_orderkey")
    val direct = df.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("s"), count(lit(1)).as("c"),
        min($"l_orderkey").as("mn"), max($"l_orderkey").as("mx"))
    val salted = Salting.saltedAggregate(df, Seq("l_returnflag"),
      Map("s" -> ("sum", col("l_quantity")), "c" -> ("count", lit(1)),
        "mn" -> ("min", col("l_orderkey")), "mx" -> ("max", col("l_orderkey"))),
      numSalts = 8)
    val a = direct.orderBy("l_returnflag")
      .as[(String, Double, Long, Long, Long)].collect().toSeq
    val b = salted.select($"l_returnflag", $"s", $"c", $"mn", $"mx")
      .orderBy("l_returnflag")
      .as[(String, Double, Long, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("property: version strings order chronologically (lexical == temporal)") {
    val store = new graft.core.ArtifactStore(spark, "/tmp/unused")
    val dateGen = for {
      y <- Gen.choose(2020, 2030); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    } yield java.time.LocalDateTime.of(y, m, d, 0, 0)
    val pairs = samples(Gen.zip(dateGen, dateGen), 50)
    pairs.foreach { case (t1, t2) =>
      val v1 = store.versionString(t1, "aaaaaaa")
      val v2 = store.versionString(t2, "aaaaaaa")
      assert((v1 < v2) == t1.isBefore(t2) || v1 == v2)
    }
  }
  test("registry integrity: unique names, every oracle belongs to a query") {
    val names = graft.queries.Registry.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names would shadow in the driver map: ${names.diff(names.distinct)}")
    assert(SparkEntry.queries.keySet == names.toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
    // the driver smoke-checks entry(): keep it pointing at a live query
    assert(names.contains("q05_multiway_join"))
  }

  test("property: z-order key bit-interleave round-trips to its grid cell") {
    import graft.functions.Geo
    val cells = samples(Gen.zip(Gen.chooseNum(0L, 255L), Gen.chooseNum(0L, 255L)), 40)
    val df = cells.toDF("gx", "gy")
      .withColumn("zkey", Geo.zorderKey(col("gx"), col("gy"), 8))
    // decode: gx bits live at odd positions, gy bits at even positions
    val decoded = df.select(col("gx"), col("gy"),
      (0 until 8).map(i =>
        shiftright(col("zkey"), 2 * i + 1).bitwiseAND(lit(1L)) * lit(1L << i))
        .reduce(_ + _).as("gx2"),
      (0 until 8).map(i =>
        shiftright(col("zkey"), 2 * i).bitwiseAND(lit(1L)) * lit(1L << i))
        .reduce(_ + _).as("gy2"))
      .as[(Long, Long, Long, Long)].collect()
    decoded.foreach { case (gx, gy, gx2, gy2) =>
      assert(gx == gx2 && gy == gy2, s"($gx,$gy) decoded to ($gx2,$gy2)")
    }
    // locality: keys of a 2x2 neighborhood differ from the base key only
    // below bit 2 (the defining z-order property for tile pruning)
    val z00 = cells.head
    val base = Geo.zorderKey(lit(z00._1 & 0xFEL), lit(z00._2 & 0xFEL), 8)
    val probe = spark.range(1).select(
      base.as("b"),
      Geo.zorderKey(lit((z00._1 & 0xFEL) + 1), lit((z00._2 & 0xFEL) + 1), 8).as("c"))
      .as[(Long, Long)].head()
    assert((probe._2 - probe._1) == 3L)
  }

  test("property: groups_comp preserves the labelled total through the Other bucket") {
    import graft.pipeline.SummaryData
    val rows = Seq(
      ("TUN", 5e6), ("TUN", 3e6), ("RAX", 4e6), ("SNA", 2e6),
      ("COZ", 1e4), ("PEZ", 2e4), // sub-1% groups -> Other
      ("ZZZ", 9e9)                // unlisted taxon: excluded from the total
    ).toDF("catch_taxon", "catch")
    val out = SummaryData.groupsComposition(rows)
      .as[(String, Long)].collect().toMap
    // truncation loses < 1 unit per group; totals agree within group count
    val labelledTotal = ((5e6 + 3e6 + 4e6 + 2e6 + 1e4 + 2e4) / 1e6).toLong
    assert(math.abs(out.values.sum - labelledTotal) <= out.size)
    assert(out.contains("Other") && out("Other") == 0L) // 3e4 truncates to 0 millions
    assert(!out.keySet.exists(_ == "ZZZ"))
  }

  test("property: coalescePrefixFamilies keeps exactly one column per family + passthrough") {
    import graft.operators.Harmonize
    val df = Seq((1L, "a", "b", "c", "x"))
      .toDF("id", "P1.f", "P2.f", "P1.g", "other")
    val out = Harmonize.coalescePrefixFamilies(df, Seq("P1.", "P2."))
    assert(out.columns.sorted.toSeq == Seq("f", "g", "id", "other"))
    val r = out.head()
    assert(r.getAs[String]("f") == "a") // P1 wins the coalesce order
    assert(r.getAs[String]("g") == "c")
  }

  test("property: packing conserves tokens, offsets stay under capacity, stradlers flagged") {
    import graft.text.Packing
    val docs = Seq((1L, 1000L), (2L, 1500L), (3L, 600L), (4L, 3000L), (5L, 10L))
      .toDF("doc_id", "n_tok")
    val packed = Packing.pack(docs, "doc_id", "n_tok", capacity = 2048L, nShards = 2)
    val rows = packed.collect()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == 6110L)
    assert(rows.forall(r => r.getAs[Long]("offset") >= 0 &&
      r.getAs[Long]("offset") < 2048L))
    // a doc is flagged iff its span crosses its bin's end
    rows.foreach { r =>
      val crosses = r.getAs[Long]("offset") + r.getAs[Long]("n_tokens") > 2048L
      assert(r.getAs[Boolean]("spans_bins") == crosses)
    }
  }

  test("property: LM scores are non-positive and rank corpus text above gibberish") {
    import graft.text.LangModel
    val corpus = Seq(
      (1L, "the boat landed fresh fish at the market today"),
      (2L, "the boat landed fresh fish at the port yesterday"),
      (3L, "fresh fish at the market sell quickly every day")
    ).toDF("doc_id", "text")
    val model = LangModel.train(corpus, "doc_id", "text")
    val batch = Seq(
      (10L, "the boat landed fresh fish at the market today"), // in-distribution
      (11L, "zxq wvut plok mnab qrst uvxy zabc defg hijk")     // gibberish
    ).toDF("doc_id", "text")
    val scores = LangModel.score(batch, model, "doc_id", "text")
      .select($"doc", $"logprob").as[(Long, Double)].collect().toMap
    assert(scores.values.forall(_ <= 0.0))
    assert(scores(10L) > scores(11L),
      s"in-distribution text must outscore gibberish: $scores")
  }

  test("property: packFirstFit invariants on generated token streams") {
    import graft.text.Packing
    val gen: Gen[List[Long]] = Gen.chooseNum(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 70L)))
    samples(gen, 5).foreach { tokens =>
      val cap = 50L
      val df = tokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "n_tok")
      val out = Packing.packFirstFit(df, "doc_id", "n_tok", cap, nShards = 4).collect()
      assert(out.length == tokens.length)
      assert(out.map(_.getAs[Long]("n_tokens")).sum == tokens.sum)
      out.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin"))).foreach {
        case (_, rs) =>
          if (rs.exists(_.getAs[Boolean]("oversize"))) assert(rs.length == 1)
          else assert(rs.map(_.getAs[Long]("n_tokens")).sum <= cap)
      }
    }
  }

  test("property: selfSpanDedup conserves tokens and is repartition-invariant") {
    // small vocab + short docs force genuine cross- and within-doc
    // 4-gram repeats in most samples
    val docGen: Gen[List[String]] = Gen.chooseNum(3, 10).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(4, 30).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
    }
    for ((texts, i) <- samples(docGen, 5).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.dedup.Dedup.selfSpanDedup(docs, "doc_id", "text", n = 4)
        .select($"doc", $"n_tokens", $"n_removed", $"clean_text")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      for ((_, nTok, nRem, clean) <- out) {
        val keptLen = if (clean.isEmpty) 0 else clean.split(" ").length
        assert(nTok - nRem == keptLen, s"sample $i: tokens not conserved")
        assert(nRem >= 0 && nRem <= nTok)
      }
      // at least one duplicated 4-gram must exist in this vocab regime
      // for most samples; when any doc repeats another verbatim, the
      // later copy must be fully erased
      val byText = texts.zipWithIndex.groupBy(_._1)
      for ((_, occ) <- byText if occ.size > 1; (_, id) <- occ.drop(1)
           if texts(id).split(" ").length >= 4)
        assert(out(id)._4 == "", s"sample $i: later verbatim copy not erased")
      // partitioning must not change the result
      val out2 = graft.dedup.Dedup.selfSpanDedup(
        docs.repartition(7), "doc_id", "text", n = 4)
        .select($"doc", $"n_tokens", $"n_removed", $"clean_text")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      assert(out2.toSeq == out.toSeq, s"sample $i: repartition changed output")
    }
  }

  test("property: sliding windows tile every generated doc exactly once per stride") {
    import graft.text.Chunking
    val gen: Gen[(Int, Int, Int)] = for {
      n <- Gen.chooseNum(1, 300)       // tokens
      max <- Gen.chooseNum(4, 40)      // window
      ov <- Gen.chooseNum(0, 3)        // overlap < max
    } yield (n, max, ov)
    samples(gen, 6).foreach { case (n, max, ov) =>
      val df = Seq((1L, (0 until n).map(i => s"t$i").mkString(" ")))
        .toDF("doc_id", "text")
      val ws = Chunking.slidingWindows(df, "doc_id", "text", max, ov)
        .select("tok_start", "tok_end").as[(Long, Long)].collect().sortBy(_._1)
      assert(ws.head._1 == 0L && ws.last._2 == n.toLong, s"(n=$n,max=$max,ov=$ov)")
      ws.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._1 == a._1 + (max - ov), "stride violated")
          assert(b._1 <= a._2, "gap between windows") // equality at overlap 0
        case _ =>
      }
      if (ws.length > 1) assert(ws(ws.length - 2)._2 < n.toLong, "non-minimal window count")
    }
  }

  test("property: rate-sampled strata stay within binomial bounds and nest by rate") {
    import graft.operators.Sampling
    val df = (0 until 2000).map(i => (i.toLong, "s")).toDF("id", "lang")
    // monotone: the kept set at a lower rate is a subset of a higher rate
    def kept(r: Double) = Sampling.sampleByRate(df, col("lang"), col("id"),
      Map("s" -> r)).select("id").as[Long].collect().toSet
    val k25 = kept(0.25); val k5 = kept(0.5); val k9 = kept(0.9)
    assert(k25.subsetOf(k5) && k5.subsetOf(k9), "same-salt draws must nest by rate")
    assert(math.abs(k5.size - 1000) < 120, s"p=0.5 of 2000: got ${k5.size}")
  }

  test("property: word_ngrams equals the fold spelling on random token arrays") {
    import graft.text.TextFunctions
    val tokGen: Gen[List[String]] = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaStr.map(_.take(4)),
        Gen.const("a"), Gen.const(""))))
    def legacy(tokens: org.apache.spark.sql.Column, k: Int, distinct: Boolean) = {
      val nn = size(tokens)
      val grams = transform(sequence(lit(1), nn - (k - 1)), i =>
        concat_ws(" ", (0 until k).map(j => element_at(tokens, i + lit(j))): _*))
      when(nn >= k, if (distinct) array_distinct(grams) else grams)
        .otherwise(array().cast("array<string>"))
    }
    val cases = samples(tokGen, 40)
    val df = cases.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
    Seq((2, true), (3, false), (5, true)).foreach { case (k, d) =>
      val fn = if (d) TextFunctions.shingles(col("t"), k) else TextFunctions.ngrams(col("t"), k)
      val rows = df.select(fn.as("n"), legacy(col("t"), k, d).as("o"))
        .as[(Seq[String], Seq[String])].collect()
      assert(rows.forall { case (n, o) => n == o }, s"k=$k distinct=$d")
    }
  }

  test("property: z-order column equals the reference interleave on random grid points") {
    import graft.functions.ZOrder
    val g = for {
      a <- Gen.chooseNum(0L, 0xFFFFFFFFL)
      b <- Gen.chooseNum(0L, 0xFFFFFFFFL)
    } yield (a, b)
    val pts = samples(g, 200)
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == ZOrder.zValueRef(a, b), s"($a,$b)") }
    // and the reference itself round-trips: de-interleaving recovers the inputs
    def unspread(z: Long): Long = {
      var x = z & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      (x | (x >> 16)) & 0xFFFFFFFFL
    }
    got.foreach { case (a, b, z) =>
      assert(unspread(z) == a && unspread(z >>> 1) == b)
    }
  }

  test("property: adc_distance equals the interpreted fold on random LUT/code pairs") {
    graft.similarity.Pq.register(spark)
    val g = for {
      m <- Gen.chooseNum(1, 8)
      ksub <- Gen.chooseNum(1, 8)
      lut <- Gen.listOfN(m, Gen.listOfN(ksub, Gen.chooseNum(0L, 1000000L)))
      codes <- Gen.listOfN(m, Gen.chooseNum(0, ksub - 1))
    } yield (lut.map(_.toArray).toArray, codes.toArray)
    val cases = samples(g, 30)
    val df = cases.zipWithIndex.map { case ((l, c), i) => (i, l, c) }
      .toDF("i", "lut", "codes")
    val rows = df.select(
        call_function("adc_distance", col("lut"), col("codes")).as("n"),
        aggregate(zip_with(col("lut"), col("codes"),
          (l, cd) => element_at(l, cd + 1)), lit(0L), (acc, x) => acc + x).as("o"))
      .as[(Long, Long)].collect()
    assert(rows.forall { case (n, o) => n == o })
  }

  test("property: Neyman allocation conserves any feasible budget and respects caps") {
    import graft.operators.Allocation
    val g = for {
      nStrata <- Gen.chooseNum(1, 6)
      rows <- Gen.listOfN(nStrata, for {
        n <- Gen.chooseNum(1, 40)
        base <- Gen.chooseNum(0, 50)
        spread <- Gen.chooseNum(0, 9)
      } yield (n, base, spread))
      budget <- Gen.chooseNum(1L, 60L)
    } yield (rows, budget)
    samples(g, 8).foreach { case (spec, budget) =>
      val rows = spec.zipWithIndex.flatMap { case ((n, base, spread), i) =>
        (0 until n).map(j => (s"s$i", (base + (j % (spread + 1))).toDouble))
      }
      val df = rows.toDF("stratum", "x")
      val out = Allocation.neyman(df, "stratum", "x", budget)
        .select($"stratum", $"n_rows", $"alloc", $"weight")
        .as[(String, Long, Long, Double)].collect()
      out.foreach { case (_, n, a, _) => assert(a >= 0 && a <= n) }
      val total = out.map(_._3).sum
      val capacity = out.filter(_._4 > 0).map(_._2).sum
      if (out.exists(_._4 > 0))
        assert(total == math.min(budget, capacity),
          s"budget $budget capacity $capacity allocated $total in ${out.toSeq}")
      else assert(total == 0L, "all-zero-variance frame allocates nothing")
    }
  }
}
