package graft

import org.apache.spark.sql.functions._
import graft.dedup.Novelty

/** Corpus-order novelty scoring: duplicate/fresh/partial semantics,
  * shingle-less absence, partitioning determinism, census fold. */
class NoveltySpec extends SparkSpec {
  import spark.implicits._

  // doc 1: fresh prose. doc 2: exact duplicate of 1. doc 3: half doc 1,
  // half fresh. doc 4: too short to 3-shingle.
  private val base = "a b c d e f"
  private def docs = Seq(
    (1L, base, "s1"),
    (2L, base, "s1"),
    (3L, "a b c x y z", "s2"),
    (4L, "a b", "s2")).toDF("doc_id", "text", "source")

  test("noveltyScores: duplicate scores 0, first occurrence 1, overlap fractional; short docs absent") {
    val scored = Novelty.noveltyScores(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(scored.keySet == Set(1L, 2L, 3L)) // doc 4 has no 3-shingles
    assert(scored(1L) == ((1L, 4L, 4L, 1.0))) // all 4 shingles first here
    assert(scored(2L) == ((2L, 4L, 0L, 0.0))) // exact duplicate of doc 1
    // doc 3 shares only "a b c" with doc 1; its other 3 shingles are new
    assert(scored(3L) == ((3L, 4L, 3L, 0.75)))
  }

  test("noveltyScores: stable under input repartitioning") {
    val a = Novelty.noveltyScores(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = Novelty.noveltyScores(docs.repartition(5), "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("noveltyCensus: per-group mean and below-threshold count") {
    val census = Novelty.noveltyCensus(docs, "doc_id", "text", 3,
        col("source"), threshold = 0.5)
      .as[(String, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(census("s1") == (("s1", 2L, 0.5, 1L)))  // docs 1 and 2
    assert(census("s2") == (("s2", 1L, 0.75, 0L))) // doc 4 excluded
  }

  test("incrementalNovelty: landed corpus is the reference; batch-internal repeats stay novel") {
    import graft.dedup.Dedup
    val landed = Seq((1L, base)).toDF("doc_id", "text")
    val idx = Dedup.shingleIndex(landed, "doc_id", "text", 3)
    // batch: doc 10 duplicates landed text (novelty 0); doc 11 is fresh;
    // doc 12 duplicates doc 11 — still fully novel vs the LANDED corpus
    val fresh = "p q r s t"
    val batch = Seq((10L, base), (11L, fresh), (12L, fresh))
      .toDF("doc_id", "text")
    val scored = Novelty.incrementalNovelty(batch, idx, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(scored(10L) == ((10L, 4L, 0L, 0.0)))
    assert(scored(11L) == ((11L, 3L, 3L, 1.0)))
    assert(scored(12L) == ((12L, 3L, 3L, 1.0)))
  }

  test("plan: first-occurrence is a window over the shingle exchange, no self-join of the index") {
    val plan = Novelty.noveltyScores(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "expected a min-over-shingle window")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    // one scan of the input, not one per consumer subtree
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans <= 1, s"index subtree re-derived ($scans scans):\n$plan")
  }
}
