package graft

import graft.graph.KTruss

@org.scalatest.tags.Slow
class KTrussSpec extends SparkSpec {
  import spark.implicits._

  private def peelMap(edges: Seq[(String, String)], k: Int, rounds: Int) =
    KTruss.peel(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("K4 with a pendant triangle: the 4-truss keeps exactly the clique") {
    // K4 on a..d (every edge in 2 triangles), triangle d-e-f hanging off
    // (each of its edges in 1 triangle → peeled at k=4), pendant f-g
    val k4 = for {
      (i, a) <- Seq("a", "b", "c", "d").zipWithIndex
      (j, b) <- Seq("a", "b", "c", "d").zipWithIndex if a < b
    } yield (i, j)
    val edges = k4 ++ Seq(("d", "e"), ("e", "f"), ("d", "f"), ("f", "g"))
    val out = peelMap(edges, k = 4, rounds = 3)
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")))
    assert(out.values.forall(_ == 2L), s"every K4 edge sits in 2 triangles: $out")
  }

  test("cascade: peeling one edge strips a triangle that survived round 1") {
    // Triangle a-b-c plus edge c-d closing NO triangle: a-b-c survives
    // k=3 (support 1 ≥ 1); c-d has support 0 → dropped round 1. At k=4
    // the triangle's supports (1 < 2) die in round 1 → empty truss.
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))
    val k3 = peelMap(edges, k = 3, rounds = 3)
    assert(k3.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(k3.values.forall(_ == 1L))
    assert(peelMap(edges, k = 4, rounds = 3).isEmpty)
  }

  test("rounds past the fixpoint are no-ops; duplicates/reversals canonicalized") {
    val k4 = for {
      (i, a) <- Seq("a", "b", "c", "d").zipWithIndex
      (j, b) <- Seq("a", "b", "c", "d").zipWithIndex if a < b
    } yield (i, j)
    val noisy = k4 ++ k4.map(_.swap) ++ Seq(("a", "a"), ("d", "e"))
    assert(peelMap(noisy, k = 4, rounds = 2) == peelMap(noisy, k = 4, rounds = 4))
  }

  test("two K4s sharing one edge: the shared edge's support adds across cliques") {
    val nodes1 = Seq("a", "b", "c", "d")
    val nodes2 = Seq("c", "d", "x", "y")
    def clique(ns: Seq[String]) = for {
      (i, p) <- ns.zipWithIndex; (j, q) <- ns.zipWithIndex if p < q
    } yield (i, j)
    val out = peelMap((clique(nodes1) ++ clique(nodes2)).distinct, k = 4, rounds = 3)
    assert(out(("c", "d")) == 4L, "shared edge: 2 triangles per clique")
    assert(out(("a", "b")) == 2L)
    assert(out.size == 11)
  }
}
