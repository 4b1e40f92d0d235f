package graft

import graft.graph.PointerJump
import org.apache.spark.sql.functions._

/** Pointer jumping ([[graft.graph.PointerJump.linearize]]): hand-traced
  * chains and trees, deep-chain convergence, all-roots identity,
  * partitioning determinism. */
@org.scalatest.tags.Slow
class PointerJumpSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Option[Long])], parts: Int = 4) =
    PointerJump.linearize(
      edges.toDF("node", "parent").repartition(parts), "node", "parent")
      .select($"node", $"root", $"depth", $"path")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("a chain resolves every node to the root with exact depth and path") {
    val m = run(Seq(1L -> None, 2L -> Some(1L), 3L -> Some(2L), 4L -> Some(3L)))
    assert(m(1L) == ((1L, 0L, "1")))
    assert(m(2L) == ((1L, 1L, "2,1")))
    assert(m(4L) == ((1L, 3L, "4,3,2,1")))
  }

  test("a tree resolves siblings to the same root with branch-correct paths") {
    // 10 <- {11, 12}; 11 <- 13
    val m = run(Seq(10L -> None, 11L -> Some(10L), 12L -> Some(10L),
      13L -> Some(11L)))
    assert(m(12L) == ((10L, 1L, "12,10")))
    assert(m(13L) == ((10L, 2L, "13,11,10")))
  }

  test("a 300-deep chain converges (log-round doubling, not 300 joins)") {
    val edges = (0L to 300L).map(i =>
      i -> (if (i == 0) None else Some(i - 1)))
    val m = run(edges, parts = 8)
    assert(m(300L)._1 == 0L && m(300L)._2 == 300L)
    assert(m(300L)._3 == (300L to 0L by -1L).mkString(","))
  }

  test("an all-roots forest is the identity") {
    val m = run(Seq(5L -> None, 6L -> None))
    assert(m(5L) == ((5L, 0L, "5")) && m(6L) == ((6L, 0L, "6")))
  }

  test("a cycle fails fast instead of emitting truncated paths") {
    // 1 -> 2 -> 3 -> 1: no node ever resolves; maxRounds exhaustion
    // must throw (reply-to loops occur in scraped data), not return
    // partial walks that look complete downstream
    val edges = Seq(1L -> Option(2L), 2L -> Option(3L), 3L -> Option(1L))
    val e = intercept[IllegalArgumentException] {
      PointerJump.linearize(
        edges.toDF("node", "parent"), "node", "parent", maxRounds = 6)
        .collect()
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("results are identical at any partitioning") {
    val edges = (0L to 200L).map(i =>
      i -> (if (i % 17 == 0) None else Some(i - 1)))
    assert(run(edges, 1) == run(edges, 16))
  }
}
