package graft

import graft.core.Tables
import graft.similarity.Knn
import org.apache.spark.sql.functions._

@org.scalatest.tags.Slow
class KnnSpec extends SparkSpec {
  import spark.implicits._

  test("brute-force top-k ranks by cosine with id tie-break") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),  // closest to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal
      (3L, Array(1.0f, 0.0f, 0.0f))   // identical to 0
    ).toDF("vec_id", "embedding")
    val top = Knn.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 3)
      .orderBy("rank").select($"nid").as[Long].collect().toSeq
    assert(top == Seq(3L, 1L, 2L)) // identical first, then near, then orthogonal
  }

  test("LSH ANN achieves reasonable recall@5 against brute force on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 20)
    val exact = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val approx = Knn.lshTopK(emb, queries, "vec_id", "embedding", 5,
      numPlanes = 4, numTables = 8)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 8 tables × 4 planes: each table's buckets cover ~1/16 of the
    // corpus; the OR over tables should recover most true neighbours.
    assert(recall > 0.5, s"recall $recall suspiciously low")
    assert(approx.subsetOf(exact.union(approx)), "sanity")
  }

  test("cosinePairs is symmetric-free (va<vb) and respects the threshold") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.01f)),
      (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    // near-identical vectors collide in every table, so the bucketed
    // path finds the pair regardless of the plane draw
    val pairs = Knn.cosinePairs(vecs, "vec_id", "embedding", 0.9)
      .select($"va", $"vb").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
    val exact = Knn.cosinePairsExact(vecs, "vec_id", "embedding", 0.9)
      .select($"va", $"vb").as[(Long, Long)].collect().toSet
    assert(exact == Set((0L, 1L)))
  }

  test("cosinePairs candidates are bucket-local: subset of exact, matching cosines, no n² join") {
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" < 80)
    val bucketed = Knn.cosinePairs(emb, "vec_id", "embedding", 0.2)
      .select($"va", $"vb", round($"cos", 6).as("cos"))
      .as[(Long, Long, Double)].collect().toMap2
    val exact = Knn.cosinePairsExact(emb, "vec_id", "embedding", 0.2)
      .select($"va", $"vb", round($"cos", 6).as("cos"))
      .as[(Long, Long, Double)].collect().toMap2
    assert(bucketed.nonEmpty, "bucketed pair set should be non-empty on real embeddings")
    assert(bucketed.keySet.subsetOf(exact.keySet), "bucket candidates must verify exactly")
    bucketed.foreach { case (k, c) => assert(exact(k) == c, s"cosine mismatch at $k") }
    // the candidate join must be a hash/merge join on (t, bucket) —
    // never a nested-loop/cartesian over the corpus
    val plan = Knn.cosinePairs(emb, "vec_id", "embedding", 0.2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"cosinePairs must not plan an all-pairs join:\n$plan")
  }

  test("semanticDedup keeps exactly the rows with no smaller-id near neighbour") {
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" < 100)
    val verdicts = Knn.semanticDedup(emb, "vec_id", "embedding", 0.25)
      .select($"vec_id", $"n_dups", $"kept").as[(Long, Long, Boolean)].collect()
    // total partition: one verdict per input id
    assert(verdicts.length == emb.count())
    // kept ⇔ n_dups == 0
    verdicts.foreach { case (id, n, kept) =>
      assert(kept == (n == 0), s"id $id: kept=$kept but n_dups=$n")
    }
    // the smallest id can have no smaller neighbour — always kept
    val minId = verdicts.map(_._1).min
    assert(verdicts.find(_._1 == minId).get._3, s"min id $minId must be kept")
    // verdicts agree with the pair list the same buckets produce
    val expectedDrops = Knn.cosinePairs(emb, "vec_id", "embedding", 0.25)
      .select($"vb").as[Long].collect().toSet
    assert(verdicts.filterNot(_._3).map(_._1).toSet == expectedDrops)
    // non-vacuous at this threshold on the real embeddings
    assert(expectedDrops.nonEmpty, "threshold should drop at least one row")
  }

  test("hardNegatives: every result sits strictly inside the band, ranked desc") {
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" < 150)
    val q = emb.filter($"vec_id" < 3)
    val (lo, hi) = (50000000L, 300000000L)
    val out = Knn.hardNegatives(emb, q, "vec_id", "embedding", lo, hi, k = 5)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty, "band should be non-empty on real embeddings")
    out.foreach { case (_, _, _, cos) => assert(cos >= lo && cos <= hi) }
    out.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq,
        "cos_e9 must be non-increasing in rank")
      assert(sorted.length <= 5)
    }
    // band members above the top-k cutoff are excluded, near-dups too:
    // compare against brute-force top-k, which may contain above-band hits
    val bf = Knn.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
      .select($"qid", $"nid", floor($"cos" * 1e9 + 0.5).cast("long").as("e9"))
      .as[(Long, Long, Long)].collect()
    bf.filter(_._3 > hi).foreach { case (qid, nid, _) =>
      assert(!out.exists(r => r._1 == qid && r._3 == nid),
        s"above-band $nid must not be mined as a negative for $qid")
    }
  }

  test("embeddingDecontaminate: exact copy and near-copy drop, orthogonal and opposite survive") {
    val bench = Seq((100L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),      // exact copy: cos 1.0 → drop
      (2L, Array(0.99f, 0.1f, 0f, 0f)), // near-copy: cos ≈ 0.995 → drop
      (3L, Array(0f, 1f, 0f, 0f)),      // orthogonal: cos 0 → keep
      (4L, Array(-1f, 0f, 0f, 0f)),     // opposite: cos −1 → keep
      (5L, Array(0.5f, 0.5f, 0.5f, 0.5f)) // cos 0.5 → keep at τ=0.9
    ).toDF("vec_id", "embedding")
    val v = Knn.embeddingDecontaminate(corpus, bench, "vec_id", "embedding",
      thresholdE9 = 900000000L)
      .select($"id", $"kept", $"max_cos_e9")
      .as[(Long, Boolean, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!v(1L)._1 && v(1L)._2 == 1000000000L)
    assert(!v(2L)._1 && v(2L)._2 > 900000000L)
    assert(v(3L)._1 && v(3L)._2 == 0L)
    assert(v(4L)._1 && v(4L)._2 == -1000000000L)
    assert(v(5L)._1 && v(5L)._2 == 500000000L)
  }

  test("embeddingDecontaminate: max over ALL benchmark rows, deterministic under repartitioning") {
    val bench = Seq(
      (100L, Array(1f, 0f, 0f, 0f)),
      (101L, Array(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val corpus = (1L to 40L).map { i =>
      (i, Array((i % 5).toFloat, (i % 3).toFloat, 1f, 0.5f))
    }.toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      Knn.embeddingDecontaminate(df, bench, "vec_id", "embedding", 900000000L)
        .select($"id", $"max_cos_e9", $"n_hits")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val a = run(corpus)
    assert(a == run(corpus.repartition(7)))
    // the max must reflect the best-matching benchmark row, not the first
    val best = a.find(_._1 == 5L).get // (0,2,1,0.5): closer to axis-y bench
    assert(best._2 > 0L)
  }

  test("embeddingDecontaminateLsh: agrees with brute force on candidates; planted dups always drop") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val prot = emb.filter($"label" === 0)
    val corpus = emb.filter($"label" =!= 0)
      .unionByName(prot.withColumn("vec_id", $"vec_id" + 100000))
    val lsh = Knn.embeddingDecontaminateLsh(corpus, prot, "vec_id", "embedding",
        thresholdE9 = 900000000L)
      .select($"id", $"max_cos_e9", $"n_hits", $"kept")
      .as[(Long, Option[Long], Long, Boolean)].collect().map(r => r._1 -> r).toMap
    val bf = Knn.embeddingDecontaminate(corpus, prot, "vec_id", "embedding",
        thresholdE9 = 900000000L)
      .select($"id", $"max_cos_e9", $"n_hits")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // every corpus row gets a verdict row
    assert(lsh.keySet == bf.keySet)
    // an exact duplicate of a protected vector projects identically on
    // every hyperplane → guaranteed candidate → must drop with cos 1e9
    val planted = lsh.keys.filter(_ >= 100000L)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val (_, maxE9, nHits, kept) = lsh(id)
      assert(!kept && nHits >= 1 && maxE9.contains(1000000000L), s"planted $id must drop")
    }
    // LSH never reports a similarity brute force doesn't have: its max
    // over candidates is ≤ the max over all protected rows, and any row
    // brute force keeps, LSH keeps too (candidates ⊆ all pairs)
    lsh.foreach { case (id, (_, maxE9, nHits, kept)) =>
      maxE9.foreach(m => assert(m <= bf(id)._2))
      assert(nHits <= bf(id)._3)
      if (bf(id)._3 == 0L) assert(kept)
    }
  }

  test("native hyperplane_tables matches the per-(table, plane) fold spelling") {
    // the compositional spelling the oracles replay via list_reduce
    val emb = graft.core.Tables.embeddings(spark, sf).limit(300)
    val d = Knn.inferDim(emb, "embedding")
    def sign(t: Int, p: Int, i: Int): Double = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$t:$p:$i".getBytes("UTF-8"))
      if (((dig(0) >> 4) & 0xf) % 2 == 1) 1.0 else -1.0
    }
    def proj(t: Int, p: Int) = {
      val signs = array((0 until d).map(i => lit(sign(t, p, i))): _*)
      aggregate(zip_with($"embedding", signs, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
    }
    def legacyBucket(t: Int) = (0 until 6).map { p =>
      when(proj(t, p) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val legacy = emb.select($"vec_id" +:
        (0 until 4).map(t => legacyBucket(t).as(s"b$t")): _*)
      .as[(Long, Long, Long, Long, Long)].collect()
      .flatMap { case (id, b0, b1, b2, b3) =>
        Seq((id, 0, b0), (id, 1, b1), (id, 2, b2), (id, 3, b3)) }.toSet
    val native = Knn.hyperplaneBuckets(emb, "vec_id", "embedding",
        numPlanes = 6, numTables = 4, dim = Some(d))
      .as[(Long, Int, Long)].collect().toSet
    assert(native == legacy && native.nonEmpty)
  }

  test("embeddingDecontaminateLsh plans no broadcast nested loop (the q147 scale gate)") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val prot = emb.filter($"label" === 0)
    val corpus = emb.filter($"label" =!= 0)
    val plan = Knn.embeddingDecontaminateLsh(corpus, prot, "vec_id", "embedding",
      thresholdE9 = 900000000L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("multi-probe with nProbes=0 is exactly single-probe LSH") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 20)
    val single = Knn.lshTopK(emb, queries, "vec_id", "embedding", 5,
      numPlanes = 6, numTables = 2)
      .select($"qid", $"rank", $"nid").as[(Long, Int, Long)].collect().toSet
    val zeroProbe = Knn.multiProbeTopK(emb, queries, "vec_id", "embedding", 5,
      numPlanes = 6, numTables = 2, nProbes = 0)
      .select($"qid", $"rank", $"nid").as[(Long, Int, Long)].collect().toSet
    assert(zeroProbe == single)
  }

  test("multi-probe recall@5 is monotone in nProbes and beats single-probe at equal tables") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 20)
    val exact = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    def recall(nProbes: Int): Double = {
      val approx = Knn.multiProbeTopK(emb, queries, "vec_id", "embedding", 5,
        numPlanes = 6, numTables = 2, nProbes = nProbes)
        .select($"qid", $"nid").as[(Long, Long)].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val r0 = recall(0); val r2 = recall(2); val r4 = recall(4)
    // more probes widen the candidate set, so top-k recall cannot drop
    assert(r2 >= r0, s"recall@2probes $r2 < recall@0probes $r0")
    assert(r4 >= r2, s"recall@4probes $r4 < recall@2probes $r2")
    assert(r4 > 0.3, s"recall@4probes $r4 suspiciously low for 2 tables")
  }

  test("hyperplane probe buckets: base matches table bucket, flips are single-bit, boundary-ranked") {
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" < 30)
    val base = Knn.hyperplaneBuckets(emb, "vec_id", "embedding", 6, 2)
      .select($"id", $"t", $"bucket").as[(Long, Int, Long)].collect()
      .map { case (id, t, b) => (id, t) -> b }.toMap
    val probes = Knn.multiProbeBuckets(emb, "vec_id", "embedding", 6, 2, nProbes = 2)
      .select($"id", $"t", $"bucket").as[(Long, Int, Long)].collect()
      .groupBy { case (id, t, _) => (id, t) }
    probes.foreach { case ((id, t), rows) =>
      assert(rows.length == 3) // base + 2 probes
      val b = base((id, t))
      assert(rows.head._3 == b, "first emitted bucket is the base bucket")
      rows.tail.foreach { case (_, _, pb) =>
        assert(java.lang.Long.bitCount(pb ^ b) == 1, s"probe $pb not 1 bit from base $b")
      }
      assert(rows.map(_._3).distinct.length == 3, "probe buckets are distinct")
    }
  }

  test("probe-count edges: nProbes=numPlanes probes every flip; nProbes>numPlanes is rejected") {
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" < 5)
    val all = Knn.multiProbeBuckets(emb, "vec_id", "embedding", 6, 2, nProbes = 6)
    assert(all.count() == 5 * 2 * 7) // 5 vecs × 2 tables × (base + 6 flips)
    val bad = Knn.multiProbeBuckets(emb, "vec_id", "embedding", 6, 2, nProbes = 7)
    val e = intercept[Exception] { bad.count() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("nProbes")), s"unexpected error: $e")
  }

  test("multi-probe candidate join has no cartesian product") {
    val emb = Tables.embeddings(spark, sf)
    val plan = Knn.multiProbeTopK(emb, emb.filter($"vec_id" < 5), "vec_id", "embedding", 5,
      numPlanes = 6, numTables = 2, nProbes = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  private implicit class Pairs(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] =
      rows.map { case (a, b, c) => (a, b) -> c }.toMap
  }
}
