package graft

import org.apache.spark.sql.functions._
import graft.graph.PageRank

@org.scalatest.tags.Slow
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000000L

  /** Driver-side reference: the same integer power iteration, computed
    * with plain Scala maps — validates the distributed plan against an
    * independently-coded single-node derivation. */
  private def reference(edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] = {
    val e = edges.filter(t => t._1 != t._2)
      .groupBy(t => (t._1, t._2)).map { case ((s0, d0), g) => (s0, d0, g.map(_._3).sum) }.toSeq
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.length
    val wtot = e.groupBy(_._1).map { case (k, g) => k -> g.map(_._3).sum }
    val base = (S * 15 / 100) / n
    var rank = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(wtot.contains).map(rank).sum
      val contrib = e.groupBy(_._2).map { case (dst, g) =>
        dst -> g.map { case (src, _, w) => ((rank(src) * 85 / 100) * w) / wtot(src) }.sum
      }
      rank = nodes.map(v => v -> (base + contrib.getOrElse(v, 0L) + (dm * 85 / 100) / n)).toMap
    }
    rank
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] =
    PageRank.run(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("triangle with a sink matches the single-node reference") {
    val edges = Seq(
      ("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L), // cycle
      ("a", "d", 1L))                                 // d is dangling
    assert(run(edges, 4) == reference(edges, 4))
  }

  test("weighted edges shift mass toward the heavier target") {
    val edges = Seq(("a", "b", 9L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L))
    val got = run(edges, 4)
    assert(got == reference(edges, 4))
    assert(got("b") > got("c"))
  }

  test("rank mass is conserved up to truncation shed") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)(
      (s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}", 1L + rnd.nextInt(3).toLong))
    val got = run(edges, 4)
    val total = got.values.sum
    // each round sheds < 1 unit per node per truncating division (3 divs)
    assert(total <= S && total >= S - 4L * 40 * 3)
    assert(got == reference(edges, 4))
  }

  test("continueFrom on the same graph is exactly one more round") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(250)(
      (s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}", 1L + rnd.nextInt(2).toLong))
    val df = edges.toDF("src", "dst", "w")
    val five = PageRank.run(df, 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val warm = PageRank.continueFrom(df, PageRank.run(df, 4), 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(warm == five)
  }

  test("continueFrom seeds newly-discovered nodes at the uniform share") {
    val landed = Seq(("a", "b", 1L), ("b", "a", 1L))
    val withNew = landed ++ Seq(("a", "c", 1L), ("c", "a", 1L))
    val r0 = PageRank.run(landed.toDF("src", "dst", "w"), 2)
    val warm = PageRank.continueFrom(withNew.toDF("src", "dst", "w"), r0, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(warm.keySet == Set("a", "b", "c"))
    // c received mass from a's split outlinks this round
    assert(warm("c") > 0L)
  }

  test("result is invariant under input partitioning") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(200)(
      (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}", 1L))
    val df = edges.toDF("src", "dst", "w")
    val a = PageRank.run(df.repartition(1), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = PageRank.run(df.repartition(13, col("dst")), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  /** Driver-side reference for the PERSONALIZED variant: restart and
    * dangling mass land on the seed set only. */
  private def referencePpr(edges: Seq[(String, String, Long)], seeds: Set[String],
                           iters: Int): Map[String, Long] = {
    val e = edges.filter(t => t._1 != t._2)
      .groupBy(t => (t._1, t._2)).map { case ((s0, d0), g) => (s0, d0, g.map(_._3).sum) }.toSeq
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val k = seeds.size
    val wtot = e.groupBy(_._1).map { case (kk, g) => kk -> g.map(_._3).sum }
    val base = (S * 15 / 100) / k
    var rank = nodes.map(v => v -> (if (seeds(v)) S / k else 0L)).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(wtot.contains).map(rank).sum
      val contrib = e.groupBy(_._2).map { case (dst, g) =>
        dst -> g.map { case (src, _, w) => ((rank(src) * 85 / 100) * w) / wtot(src) }.sum
      }
      rank = nodes.map(v => v -> ((if (seeds(v)) base else 0L) +
        contrib.getOrElse(v, 0L) + (if (seeds(v)) (dm * 85 / 100) / k else 0L))).toMap
    }
    rank
  }

  test("personalized: matches the single-node reference; mass stays seed-anchored") {
    val edges = Seq(
      ("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L),
      ("a", "d", 1L), ("d", "e", 2L), ("e", "a", 1L))
    val seeds = Seq("a")
    val got = PageRank.personalized(edges.toDF("src", "dst", "w"), seeds, iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == referencePpr(edges, seeds.toSet, 4))
    // proximity semantics: the seed outranks everything in its own walk
    assert(got("a") > got("c") && got("a") > got("e"))
  }

  test("personalized with ALL nodes as seeds equals global pagerank") {
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L), ("a", "d", 1L))
    val nodes = Seq("a", "b", "c", "d")
    val ppr = PageRank.personalized(edges.toDF("src", "dst", "w"), nodes, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ppr == run(edges, 3))
  }
}
