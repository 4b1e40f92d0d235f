package graft

import graft.core.Tables
import graft.similarity.{Knn, Pq}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("codes are within [0, ksub) and encoding is partitioning-invariant") {
    val emb = Tables.embeddings(spark, sf)
    val books = Pq.trainCodebooks(emb, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 4, iters = 1)
    def codesOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", Pq.encodeCol(Knn.scaledVec($"embedding"), books).as("c"))
        .as[(Long, Seq[Int])].collect().toMap
    val a = codesOf(emb.repartition(1))
    val b = codesOf(emb.repartition(7))
    assert(a == b)
    assert(a.values.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 4)))
  }

  test("training is deterministic and Lloyd round changes some centroid") {
    val emb = Tables.embeddings(spark, sf)
    val b0 = Pq.trainCodebooks(emb, "vec_id", "embedding", 64, 8, 4, iters = 0)
    val b1 = Pq.trainCodebooks(emb, "vec_id", "embedding", 64, 8, 4, iters = 1)
    val b1b = Pq.trainCodebooks(emb, "vec_id", "embedding", 64, 8, 4, iters = 1)
    assert(b1.flatten.flatten.toSeq == b1b.flatten.flatten.toSeq)
    assert(b0.flatten.flatten.toSeq != b1.flatten.flatten.toSeq,
      "one Lloyd round should move at least one centroid on real data")
  }

  test("ADC ranking beats chance: recall@5 against the exact L2 baseline") {
    // PQ quantizes L2 geometry, so the yardstick is exact L2 top-k
    // (cosine top-k would mix in norm differences the quantizer
    // faithfully preserves)
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 20)
    val q = queries.select($"vec_id".as("qid"), Knn.scaledVec($"embedding").as("qv"))
    val c = emb.select($"vec_id".as("nid"), Knn.scaledVec($"embedding").as("cv"))
    val d2 = aggregate(zip_with($"qv", $"cv", (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"d2".asc, $"nid".asc)
    val exact = c.crossJoin(broadcast(q)).filter($"qid" =!= $"nid")
      .withColumn("d2", d2)
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val approx = Pq.adcTopK(emb, queries, "vec_id", "embedding", 5,
        dim = 64, m = 16, ksub = 16)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val n = emb.count()
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 16 nibble codes per subspace; must beat the ~5/(n−1)
    // random-overlap floor by a wide margin
    assert(recall > 20.0 * 5.0 / (n - 1).toDouble,
      s"recall $recall vs chance ${5.0 / (n - 1)}")
    assert(approx.groupBy(_._1).values.forall(_.size == 5))
  }

  test("IVF x PQ prunes to probed cells and never plans a cartesian") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 10)
    val composed = Pq.ivfAdcTopK(emb, queries, "vec_id", "embedding", 5,
      nLists = 4, nProbe = 2, dim = 64, m = 16, ksub = 16)
    val plan = composed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val got = composed.select($"qid", $"nid", $"adc").as[(Long, Long, Long)].collect()
    assert(got.nonEmpty && got.groupBy(_._1).size == 10)
    // every composed hit carries the same ADC score the plain scan
    // assigns the pair (the cell filter only prunes, never rescores)
    val plain = Pq.adcTopK(emb, queries, "vec_id", "embedding", 5000,
        dim = 64, m = 16, ksub = 16)
      .select($"qid", $"nid", $"adc").as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    got.foreach { case (q, n, a) =>
      assert(plain((q, n)) == a, s"pair ($q,$n) rescored: $a vs ${plain((q, n))}")
    }
  }
}
