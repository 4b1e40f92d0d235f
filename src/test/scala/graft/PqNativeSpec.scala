package graft

import graft.core.Tables
import graft.similarity.{Ivf, IvfExprs, Knn, Pq}
import org.apache.spark.sql.functions._

/** The native PQ/IVF kernels (pq_lut, pq_lloyd_pairs, ivf_cell_dists,
  * ivf_cell_assign, ivf_lloyd_pairs) must replicate the compositional
  * fold spellings bit-for-bit — they replaced those spellings for
  * speed (interpreted-lambda and Project-through-Generate collapse
  * traps), not semantics, and the q48/q186/q188 oracles replay the
  * fold arithmetic in SQL. */
class PqNativeSpec extends SparkSpec {
  import spark.implicits._

  Pq.register(spark)
  IvfExprs.register(spark)

  private def legacyDist2(vecCol: String, c: Array[Double]) = {
    val lits = array(c.map(lit): _*)
    aggregate(
      zip_with(col(vecCol), lits, (x, m) => { val d = x.cast("double") - m; d * d }),
      lit(0.0), (acc, x) => acc + x)
  }

  test("ivf_cell_dists / ivf_cell_assign match the fold + when-reduce spellings") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", nLists = 4, iters = 1)
    val legacyBest = cents.zipWithIndex.map { case (c, i) =>
      struct(legacyDist2("embedding", c).as("d"), lit(i).as("i"))
    }.reduce((a, b) => when(b.getField("d") < a.getField("d"), b).otherwise(a))
    val rows = emb.select(
        call_function("ivf_cell_dists", $"embedding",
          typedlit(cents.flatten.toSeq), lit(cents.length)).as("nd"),
        array(cents.map(c => legacyDist2("embedding", c)): _*).as("od"),
        call_function("ivf_cell_assign", $"embedding",
          typedlit(cents.flatten.toSeq), lit(cents.length)).as("nc"),
        legacyBest.getField("i").as("oc"))
      .as[(Seq[Double], Seq[Double], Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nd, od, nc, oc) =>
      assert(nd == od, "distance mismatch (IEEE order must be identical)")
      assert(nc == oc)
    }
  }

  test("pq_lut matches the per-(j,c) aggregate-over-slice folds") {
    val emb = Tables.embeddings(spark, sf)
    val dim = Knn.inferDim(emb, "embedding")
    val (m, ksub) = (8, 4)
    val dsub = dim / m
    val books = Pq.trainCodebooks(emb, "vec_id", "embedding", dim, m, ksub, 1)
    val sv = Knn.scaledVec($"embedding")
    def legacySub(j: Int, cent: Array[Long]) =
      aggregate(zip_with(slice(sv, j * dsub + 1, dsub),
        array(cent.map(lit): _*), (x, c) => (x - c) * (x - c)),
        lit(0L), (acc, x) => acc + x)
    val legacyLut = array((0 until m).map { j =>
      array((0 until ksub).map(c => legacySub(j, books(j)(c))): _*)
    }: _*)
    val rows = emb.select(Pq.lutCol(sv, books).as("n"), legacyLut.as("o"))
      .as[(Seq[Seq[Long]], Seq[Seq[Long]])].collect()
    assert(rows.nonEmpty && rows.forall { case (n, o) => n == o })
  }

  test("lloyd pair generators match encode/assign + posexplode of the scaled vec") {
    val emb = Tables.embeddings(spark, sf)
    val dim = Knn.inferDim(emb, "embedding")
    val (m, ksub) = (8, 4)
    val books = Pq.trainCodebooks(emb, "vec_id", "embedding", dim, m, ksub, 0)
    val flat = books.flatMap(_.flatMap(_.toSeq)).toSeq
    val dsub = dim / m
    val sv = Knn.scaledVec($"embedding")
    val pq = emb.select($"vec_id", explode(call_function("pq_lloyd_pairs", sv,
        typedlit(flat), lit(m), lit(ksub))).as("p"))
      .select($"vec_id", $"p.c", $"p.i", $"p.e")
      .as[(Long, Int, Int, Long)].collect().toSet
    val pqLegacy = emb.select($"vec_id",
        Pq.encodeCol(sv, books).as("codes"), posexplode(sv).as(Seq("i", "e")))
      .select($"vec_id",
        element_at($"codes", ($"i" / dsub).cast("int") + 1).as("c"), $"i", $"e")
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(pq == pqLegacy && pq.nonEmpty)

    val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", nLists = 4, iters = 0)
    val iv = emb.select($"vec_id", explode(call_function("ivf_lloyd_pairs",
        $"embedding", typedlit(cents.flatten.toSeq), lit(cents.length))).as("p"))
      .select($"vec_id", $"p.cell", $"p.i", $"p.e")
      .as[(Long, Int, Int, Long)].collect().toSet
    val ivLegacy = Ivf.assignCells(emb, "embedding", cents)
      .select($"vec_id", $"__cell", posexplode(sv).as(Seq("i", "e")))
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(iv == ivLegacy && iv.nonEmpty)
  }
}
