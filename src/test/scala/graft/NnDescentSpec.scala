package graft

import org.apache.spark.sql.functions._
import graft.similarity.{Knn, NnDescent}

/** NN-descent graph build: recall against the exact brute-force
  * baseline improves with rounds and clears a floor; results are
  * partitioning-invariant; every node keeps at most k neighbors. */
@org.scalatest.tags.Slow
class NnDescentSpec extends SparkSpec {
  import spark.implicits._

  // 200 deterministic 8-dim vectors in 4 loose clusters
  private def vecs(parts: Int) = (0 until 200).map { i =>
    val c = i % 4
    (i.toLong, (0 until 8).map { j =>
      (if (j % 4 == c) 1.0f else 0.0f) +
        (math.sin(i * 31 + j * 7).toFloat * 0.3f)
    }.toArray)
  }.toDF("vec_id", "embedding").repartition(parts)

  private val K = 5

  private def recallOf(graph: Map[Long, Set[Long]]): Double = {
    val exact = Knn.bruteForceTopK(vecs(4), vecs(4), "vec_id", "embedding", K)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.toSeq.map { case (q, t) =>
      graph.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size
    }
    hits.sum / hits.size
  }

  private def graphOf(rounds: Int, parts: Int = 4): Map[Long, Set[Long]] =
    NnDescent.knnGraph(vecs(parts), "vec_id", "embedding", k = K,
        rounds = rounds, buckets = 12, bucketTables = 2)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("recall improves over rounds and clears 0.7 after two") {
    val r0 = recallOf(graphOf(0))
    val r2 = recallOf(graphOf(2))
    assert(r2 > r0, s"exchange rounds must add recall: init $r0, round2 $r2")
    assert(r2 >= 0.7, s"recall@$K after 2 rounds = $r2, expected >= 0.7")
  }

  test("deterministic under repartitioning") {
    val a = NnDescent.knnGraph(vecs(1), "vec_id", "embedding", k = K,
        rounds = 2, buckets = 12, bucketTables = 2)
      .orderBy("qid", "rank").collect().toSeq
    val b = NnDescent.knnGraph(vecs(16), "vec_id", "embedding", k = K,
        rounds = 2, buckets = 12, bucketTables = 2)
      .orderBy("qid", "rank").collect().toSeq
    assert(a == b)
  }

  test("greedySearch routes toward the query's true neighborhood") {
    // entries 0..5 cover all four clusters (i % 4): a k-NN graph over
    // clustered data is disconnected, so multi-entry is what makes
    // the walk reach every query's home component
    val graph = NnDescent.knnGraph(vecs(4), "vec_id", "embedding", k = K,
      rounds = 2, buckets = 12, bucketTables = 2)
    val out = NnDescent.greedySearch(graph, vecs(4),
        vecs(4).filter($"vec_id" < 30), "vec_id", "embedding",
        entries = Seq(0L, 1L, 2L, 3L, 4L, 5L), hops = 5)
      .select($"qid", $"found", $"cos_e9", $"moved")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 30)
    out.foreach { case (_, _, cos, moved) =>
      assert(moved <= 5)
      assert(cos >= -1000000000L && cos <= 1000000000L)
    }
    // routing must land close to the exact 1-NN for the mean query
    val exact = Knn.bruteForceTopK(vecs(4), vecs(4).filter($"vec_id" < 30),
        "vec_id", "embedding", 1)
      .select($"qid", $"cos").as[(Long, Double)].collect().toMap
    val meanResult = out.map(_._3.toDouble / 1e9).sum / out.length
    val meanBest = exact.values.sum / exact.size
    assert(meanResult > 0.9 * meanBest,
      s"greedy results ($meanResult) nowhere near the exact 1-NN mean ($meanBest)")
  }

  test("greedySearch rejects entry ids missing from the vector frame") {
    val g = NnDescent.knnGraph(vecs(2), "vec_id", "embedding", k = K,
      rounds = 0, buckets = 12, bucketTables = 2)
    val e = intercept[IllegalArgumentException] {
      NnDescent.greedySearch(g, vecs(2), vecs(2).filter($"vec_id" < 5),
        "vec_id", "embedding", entries = Seq(3L, 99999L), hops = 2)
    }
    assert(e.getMessage.contains("entry"))
  }

  test("greedySearch is deterministic across partitionings") {
    def run(parts: Int) = {
      val g = NnDescent.knnGraph(vecs(parts), "vec_id", "embedding", k = K,
        rounds = 1, buckets = 12, bucketTables = 2)
      NnDescent.greedySearch(g, vecs(parts),
          vecs(parts).filter($"vec_id" < 20), "vec_id", "embedding",
          entries = Seq(3L, 7L), hops = 4)
        .orderBy("qid").collect().toSeq
    }
    assert(run(2) == run(16))
  }

  test("insertBatch links new vectors near their true landed neighbors") {
    val all = vecs(4)
    val landed = all.filter($"vec_id" % 5 =!= 0)
    val batch = all.filter($"vec_id" % 5 === 0)
    val graph = NnDescent.knnGraph(landed, "vec_id", "embedding", k = K,
      rounds = 2, buckets = 12, bucketTables = 2)
    val delta = NnDescent.insertBatch(graph, all, batch, "vec_id",
        "embedding", k = K, entries = Seq(1L, 2L, 3L, 4L), hops = 4)
      .select($"qid", $"nid", $"cos_e9").as[(Long, Long, Long)].collect()
    val byQ = delta.groupBy(_._1)
    assert(byQ.keySet == (0 until 200 by 5).map(_.toLong).toSet)
    byQ.values.foreach(es => assert(es.length <= K))
    // delta edges only point at landed vectors
    assert(delta.forall(_._2 % 5 != 0))
    // mean best-linked cosine near the exact batch-vs-landed 1-NN mean
    val exact = Knn.bruteForceTopK(landed, batch, "vec_id", "embedding", 1)
      .select($"qid", $"cos").as[(Long, Double)].collect().toMap
    val meanGot = byQ.view.mapValues(_.map(_._3).max / 1e9).values.sum / byQ.size
    val meanExact = exact.values.sum / exact.size
    assert(meanGot > 0.9 * meanExact,
      s"insert links ($meanGot) far from exact 1-NN mean ($meanExact)")
  }

  test("every node keeps at most k neighbors, ranks dense from 1") {
    val rows = NnDescent.knnGraph(vecs(4), "vec_id", "embedding", k = K,
        rounds = 1, buckets = 12, bucketTables = 2)
      .select($"qid", $"rank").as[(Long, Int)].collect()
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks.size <= K && ranks == (1 to ranks.size), s"node $q: $ranks")
    }
  }
}
