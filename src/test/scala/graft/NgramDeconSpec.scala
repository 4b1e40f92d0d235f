package graft

import org.apache.spark.sql.functions._
import graft.dedup.NgramDecon

/** Exact n-gram collision decontamination: collision counting,
  * minCollisions threshold, bloom-prefilter invisibility, short-doc
  * survival. */
class NgramDeconSpec extends SparkSpec {
  import spark.implicits._

  // bench doc 10 carries "q w e r t y"; train doc 1 copies a 5-gram
  // window twice over ("q w e r t" + "w e r t y" = 2 distinct shingle
  // collisions), doc 2 grazes it with one collision, doc 3 is clean,
  // doc 4 is too short to shingle.
  private def bench = Seq((10L, "q w e r t y u i o p")).toDF("doc_id", "text")
  private def train = Seq(
    (1L, "q w e r t y n n n"),
    (2L, "z z z z q w e r t"),
    (3L, "a b c d e f g h"),
    (4L, "a b")).toDF("doc_id", "text")

  test("contaminatedIds: distinct-shingle collision counts; threshold filters") {
    val hits = NgramDecon.contaminatedIds(train, bench, "doc_id", "text", k = 5)
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 2L, 2L -> 1L))
    val strict = NgramDecon.contaminatedIds(train, bench, "doc_id", "text", 5,
      minCollisions = 2L).as[(Long, Long)].collect().toMap
    assert(strict == Map(1L -> 2L))
  }

  test("decontaminate: survivors = non-colliding + unshingleable; bloom prefilter changes nothing") {
    val exact = NgramDecon.decontaminate(train, bench, "doc_id", "text", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(exact == Set(3L, 4L))
    // with the bloom on (even at a sloppy fpp) the result is identical:
    // false positives die in the exact semi-join
    val bloomed = NgramDecon.decontaminate(train, bench, "doc_id", "text", 5,
      minCollisions = 1L, bloomFpp = Some(0.2))
      .select("doc_id").as[Long].collect().toSet
    assert(bloomed == exact)
  }

  test("decontaminate: stable under repartitioning; empty bench keeps everything") {
    val a = NgramDecon.decontaminate(train.repartition(7), bench, "doc_id", "text", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(a == Set(3L, 4L))
    val none = NgramDecon.decontaminate(train, bench.filter(lit(false)),
      "doc_id", "text", 5, bloomFpp = Some(0.1))
      .select("doc_id").as[Long].collect().toSet
    assert(none == Set(1L, 2L, 3L, 4L))
  }
}
