package graft

import graft.graph.Triangles

/** Degree-oriented triangle counting: closed forms on K3/K4/star/path,
  * canonicalization of dirty edge lists, and a brute-force cross-check
  * on a pseudo-random graph (the oriented count must equal the naive
  * all-triples count). */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]) =
    Triangles.perNode(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("triangles"),
          r.getAs[Double]("lcc")))
      .toMap

  test("K3: one triangle, every node lcc = 1") {
    val r = run(Seq((0L, 1L), (1L, 2L), (2L, 0L)))
    assert(r.size == 3)
    r.values.foreach { case (d, t, c) =>
      assert(d == 2L && t == 1L && c == 1.0)
    }
  }

  test("K4: three triangles per node, lcc = 1") {
    val r = run(for {
      i <- 0L to 3L; j <- 0L to 3L if i < j
    } yield (i, j))
    r.values.foreach { case (d, t, c) =>
      assert(d == 3L && t == 3L && c == 1.0)
    }
  }

  test("star and path: zero triangles, lcc = 0; degree-1 nodes lcc = 0") {
    val star = run(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    star.foreach { case (_, (_, t, c)) => assert(t == 0L && c == 0.0) }
    assert(star(0L)._1 == 4L)
    val path = run(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    path.foreach { case (_, (_, t, c)) => assert(t == 0L && c == 0.0) }
  }

  test("self-loops, duplicates and reversed duplicates canonicalize away") {
    val r = run(Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 1L),
      (1L, 2L), (2L, 0L)))
    r.values.foreach { case (d, t, c) =>
      assert(d == 2L && t == 1L && c == 1.0)
    }
  }

  test("matches brute-force all-triples count on a pseudo-random graph") {
    val n = 40
    val edges = for {
      i <- 0 until n; j <- 0 until n
      if i < j && (i * 31 + j * 17 + i * j) % 5 == 0
    } yield (i.toLong, j.toLong)
    val adj = edges.toSet
    def has(a: Long, b: Long) = adj.contains((a min b, a max b))
    var brute = Map.empty[Long, Long].withDefaultValue(0L)
    var total = 0L
    for (a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n)
      if (has(a, b) && has(b, c) && has(a, c)) {
        total += 1
        Seq(a, b, c).foreach(x => brute += x.toLong -> (brute(x.toLong) + 1))
      }
    val r = run(edges)
    val oriented = r.values.map(_._2).sum / 3
    assert(oriented == total, s"global count $oriented != brute $total")
    r.foreach { case (node, (_, t, _)) =>
      assert(t == brute(node), s"node $node: $t != ${brute(node)}")
    }
  }
}
