package graft

import graft.core.Tables
import graft.similarity.{Ivf, Knn}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF cell assignment is a total deterministic partition") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", nLists = 4, iters = 1)
    assert(cents.length == 4 && cents.head.length == 64)
    val cells = Ivf.assignCells(emb, "embedding", cents)
    assert(cells.count() == emb.count())
    val dist = cells.groupBy($"__cell").count().collect()
    assert(dist.length >= 2, "centroids should split the corpus")
    // deterministic: same inputs → same assignment
    val again = Ivf.assignCells(emb, "embedding", cents)
    assert(cells.select("vec_id", "__cell").collect().toSet ==
      again.select("vec_id", "__cell").collect().toSet)
  }

  test("IVF top-k: probed search recalls most true neighbours, all exact-scored") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 15)
    val exact = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"qid", $"nid", $"cos").as[(Long, Long, Double)].collect()
    val ivf = Ivf.topK(emb, queries, "vec_id", "embedding", 5,
      nLists = 4, nProbe = 2, iters = 1)
      .select($"qid", $"nid", $"cos").as[(Long, Long, Double)].collect()
    val exactSet = exact.map(t => (t._1, t._2)).toSet
    val ivfSet = ivf.map(t => (t._1, t._2)).toSet
    val recall = (exactSet intersect ivfSet).size.toDouble / exactSet.size
    assert(recall > 0.5, s"recall $recall too low for nProbe=2 of 4 cells")
    // scores for recalled pairs must match the exact computation
    val exactScores = exact.map(t => (t._1, t._2) -> t._3).toMap
    ivf.filter(t => exactSet((t._1, t._2))).foreach { t =>
      assert(math.abs(exactScores((t._1, t._2)) - t._3) < 1e-12)
    }
  }

  test("extendAndSearch with an empty batch equals topK trained on the same corpus") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 10)
    val whole = Ivf.topK(emb, queries, "vec_id", "embedding", 5,
      nLists = 4, nProbe = 2, iters = 1)
      .select($"qid", $"rank", $"nid").as[(Long, Int, Long)].collect().toSet
    val frozen = Ivf.extendAndSearch(emb, emb.limit(0), queries,
      "vec_id", "embedding", 5, nLists = 4, nProbe = 2, iters = 1)
      .select($"qid", $"rank", $"nid").as[(Long, Int, Long)].collect().toSet
    assert(frozen == whole)
  }

  test("incremental IVF: frozen-centroid recall close to a retrained index; census covers all rows") {
    val emb = Tables.embeddings(spark, sf)
    val landed = emb.filter($"vec_id" % 5 =!= 0)
    val batch = emb.filter($"vec_id" % 5 === 0)
    val queries = batch.filter($"vec_id" < 50)
    val exact = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val s = res.select($"qid", $"nid").as[(Long, Long)].collect().toSet
      (exact intersect s).size.toDouble / exact.size
    }
    val frozen = recallOf(Ivf.extendAndSearch(landed, batch, queries,
      "vec_id", "embedding", 5, nLists = 4, nProbe = 2, iters = 1))
    val retrained = recallOf(Ivf.topK(emb, queries, "vec_id", "embedding", 5,
      nLists = 4, nProbe = 2, iters = 1))
    // frozen centroids cost recall, but not catastrophically: the add()
    // path is serviceable between scheduled retrains
    assert(frozen >= retrained - 0.3,
      s"frozen recall $frozen collapsed vs retrained $retrained")
    assert(frozen > 0.3, s"frozen recall $frozen too low to be useful")
    // drift census: every merged row lands in exactly one cell
    val cents = Ivf.trainCentroids(landed, "vec_id", "embedding", nLists = 4, iters = 1)
    val census = Ivf.cellCensus(emb, "embedding", cents)
      .select($"cell", $"n").as[(Int, Long)].collect()
    assert(census.map(_._2).sum == emb.count())
  }
}
