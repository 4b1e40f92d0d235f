package graft

import org.apache.spark.sql.functions._
import graft.similarity.Quantize

/** Int8 quantization: exact stats, code range/extremes, the half-step
  * error bound, zero-dimension handling, and determinism under
  * repartitioning. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  // 3 dims: dim0 spans ±1, dim1 small positives, dim2 identically zero
  private def emb = Seq(
    (1L, Array(1.0f, 0.10f, 0.0f)),
    (2L, Array(-1.0f, 0.05f, 0.0f)),
    (3L, Array(0.5f, 0.20f, 0.0f)),
    (4L, Array(-0.25f, 0.15f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("dimStats: exact mean and symmetric scale per dimension") {
    val s = Quantize.dimStats(emb, "vec_id", "embedding")
      .select("dim", "n", "mean", "max_abs").as[(Int, Long, Double, Double)]
      .collect().sortBy(_._1)
    assert(s.map(_._2).forall(_ == 4L))
    assert(math.abs(s(0)._3 - 0.0625) < 1e-9)  // (1 - 1 + .5 - .25)/4
    assert(s(0)._4 == 1.0 && s(1)._4 == 0.2 && s(2)._4 == 0.0)
  }

  test("quantizeVectors: codes in [-127,127], extremes hit ±127, zero dim codes 0") {
    val codes = Quantize.quantizeVectors(emb, "vec_id", "embedding")
      .select("vec_id", "codes").as[(Long, Seq[Long])].collect().toMap
    assert(codes.values.forall(_.length == 3))
    assert(codes.values.flatten.forall(c => c >= -127 && c <= 127))
    assert(codes(1L)(0) == 127L && codes(2L)(0) == -127L) // max-magnitude elements
    assert(codes(3L)(0) == 64L)                           // round(0.5 * 127) = 64
    assert(codes.values.forall(_(2) == 0L))               // all-zero dim
    assert(codes(3L)(1) == 127L && codes(2L)(1) == 32L)   // 0.2 is dim1 max; round(.05/.2*127)
  }

  test("int8ErrorReport: half-step error bound, zero error on zero dim") {
    val r = Quantize.int8ErrorReport(emb, "vec_id", "embedding")
      .select("dim", "max_abs", "mean_abs_err", "max_abs_err")
      .as[(Int, Double, Double, Double)].collect().sortBy(_._1)
    r.foreach { case (dim, maxAbs, meanErr, maxErr) =>
      assert(meanErr <= maxErr, s"dim $dim")
      // symmetric rounding: error never exceeds half a quantization step
      assert(maxErr <= maxAbs / 127.0 / 2.0 + 1e-12, s"dim $dim: $maxErr")
    }
    assert(r(2)._3 == 0.0 && r(2)._4 == 0.0) // zero dim is lossless
  }

  test("report is identical under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Quantize.int8ErrorReport(df, "vec_id", "embedding")
        .select("dim", "mean", "std", "max_abs", "mean_abs_err", "max_abs_err")
        .as[(Int, Double, Double, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(run(emb) == run(emb.repartition(7)))
  }

  test("adcTopK with full candidate budget reproduces exact brute-force top-k") {
    val corpus = graft.core.Tables.embeddings(spark, sf).filter($"vec_id" < 120)
    val queries = corpus.filter($"vec_id" < 5)
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"rank".cast("int"), $"nid")
        .as[(Long, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    // candK = corpus size: candidate generation can't lose anything, so
    // the exact re-rank must equal the float brute-force baseline
    val adc = tuples(graft.similarity.Quantize.adcTopK(
      corpus, queries, "vec_id", "embedding", k = 5, candK = 200))
    val bf = tuples(graft.similarity.Knn.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", k = 5))
    assert(adc == bf)
  }

  test("adcTopK recall@5 vs brute force is high at a 30-candidate budget") {
    val corpus = graft.core.Tables.embeddings(spark, sf).filter($"vec_id" < 120)
    val queries = corpus.filter($"vec_id" < 5)
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"nid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val adc = sets(graft.similarity.Quantize.adcTopK(
      corpus, queries, "vec_id", "embedding", k = 5, candK = 30))
    val bf = sets(graft.similarity.Knn.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", k = 5))
    val recall = bf.map { case (q, want) =>
      (adc.getOrElse(q, Set.empty) & want).size.toDouble / want.size
    }.sum / bf.size
    assert(recall >= 0.8, s"recall@5 = $recall")
  }
}
