package graft

import graft.dedup.Blocking

/** Sorted-neighborhood blocking: window pairs match a driver-side
  * sort, candidate count is exactly linear, partitioning-invariant. */
class BlockingSpec extends SparkSpec {
  import spark.implicits._

  private val recs = Seq(
    (10L, "apple pie"), (11L, "apple pies"), (12L, "banana"),
    (13L, "applf pie"), // prefix-damaged: equality blocks would miss it
    (14L, "cherry"), (15L, "banan"), (16L, "date"), (17L, "apple pie"))

  private def pairsOf(w: Int, parts: Int) =
    Blocking.sortedNeighborhoodPairs(
        recs.toDF("k", "nm").repartition(parts), "k", "nm", w)
      .as[(Long, Long, Long)].collect().toSet

  test("window pairs equal the brute-force sorted window") {
    val order = recs.sortBy(r => (r._2, r._1)).map(_._1)
    val want = (for {
      i <- order.indices; j <- 1 to 3; if i + j < order.length
    } yield (order(i), order(i + j), j.toLong)).toSet
    assert(pairsOf(3, 4) == want)
  }

  test("candidate count is linear: w*n - w*(w+1)/2") {
    val n = recs.length
    Seq(1, 2, 3).foreach { w =>
      assert(pairsOf(w, 3).size == w * n - w * (w + 1) / 2, s"w=$w")
    }
  }

  test("partitioning-invariant") {
    assert(pairsOf(2, 1) == pairsOf(2, 7))
  }
}
