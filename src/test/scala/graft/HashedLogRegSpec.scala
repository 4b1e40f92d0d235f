package graft

import org.apache.spark.sql.functions._
import graft.stats.HashedLogReg

/** Quality-classifier training: feature hashing invariants, learning on
  * a separable fixture, partition-independent determinism, scoring. */
@org.scalatest.tags.Slow
class HashedLogRegSpec extends SparkSpec {
  import spark.implicits._

  private def labeled = (0 until 40).map { i =>
    if (i % 2 == 0) (i.toLong, "good prose reads well", 1)
    else (i.toLong, "spam junk click here", 0)
  }.toDF("doc_id", "text", "label")

  test("hashedFeatures: counts conserve token occurrences; same token same bucket; dim bound") {
    val feats = HashedLogReg.hashedFeatures(labeled, "doc_id", "text", dim = 16)
    val perDoc = feats.groupBy("__doc").agg(sum("cnt").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(perDoc.values.forall(_ == 4L)) // 4 tokens per doc, all land somewhere
    val idxRange = feats.agg(min("idx"), max("idx")).head()
    assert(idxRange.getLong(0) >= 0 && idxRange.getLong(1) < 16)
    // identical texts produce identical (idx, cnt) sets
    val a = feats.filter(col("__doc") === 0).select("idx", "cnt")
      .as[(Long, Long)].collect().toSet
    val b = feats.filter(col("__doc") === 2).select("idx", "cnt")
      .as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("train + score: separable classes separate; empty doc scores at the bias") {
    val model = HashedLogReg.train(labeled, "doc_id", "text", "label",
      dim = 16, iters = 10, lr = 1.0)
    val scored = HashedLogReg.score(
      Seq((100L, "good prose reads well"), (101L, "spam junk click here"),
        (102L, "")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(scored(100L) > 0.5, s"positive class scored ${scored(100L)}")
    assert(scored(101L) < 0.5, s"negative class scored ${scored(101L)}")
    // balanced classes keep the bias near zero → σ(b) near 0.5
    assert(math.abs(scored(102L) - 1.0 / (1.0 + math.exp(-model.bias))) < 1e-12)
  }

  test("train: weights identical at any input partitioning (decimal-routed gradients)") {
    val m1 = HashedLogReg.train(labeled, "doc_id", "text", "label", 16, 5, 0.5)
    val m2 = HashedLogReg.train(labeled.repartition(7), "doc_id", "text", "label", 16, 5, 0.5)
    assert(m1.weights.toSeq == m2.weights.toSeq && m1.bias == m2.bias)
  }
}
