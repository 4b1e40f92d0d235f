package graft

import graft.graph.LabelProp
import org.apache.spark.sql.functions._

@org.scalatest.tags.Slow
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (String, String, Long)*) =
    rows.toDF("src", "dst", "w")

  test("two cliques bridged by one weak edge settle into two communities") {
    val clique = for {
      as <- Seq("a1", "a2", "a3", "a4"); bs <- Seq("a1", "a2", "a3", "a4")
      if as < bs
    } yield (as, bs, 5L)
    val clique2 = clique.map { case (a, b, w) => (a.replace('a', 'b'), b.replace('a', 'b'), w) }
    val e = edges(clique ++ clique2 :+ (("a1", "b1", 1L)): _*)
    val got = LabelProp.run(e, iters = 3)
      .select($"node", $"label").as[(String, String)].collect().toMap
    val aLabels = Seq("a1", "a2", "a3", "a4").map(got).toSet
    val bLabels = Seq("b1", "b2", "b3", "b4").map(got).toSet
    assert(aLabels.size == 1, s"a-clique split: $got")
    assert(bLabels.size == 1, s"b-clique split: $got")
    assert(aLabels != bLabels, s"bridge merged the cliques: $got")
  }

  test("votes are weighted and ties break (weight DESC, label ASC)") {
    // x's neighbours: heavy edge to 'm', two light edges to 'z'-side
    val e = edges(("x", "m", 3L), ("x", "z1", 1L), ("x", "z2", 1L))
    // round 1: x sees labels m(3), z1(1), z2(1) → m
    val got = LabelProp.run(e, iters = 1)
      .select($"node", $"label").as[(String, String)].collect().toMap
    assert(got("x") == "m")
    // leaves each see only x's initial label
    assert(got("m") == "x" && got("z1") == "x" && got("z2") == "x")
  }

  test("result is invariant under repartitioning and duplicate edge rows") {
    val base = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 1L),
      ("c", "d", 3L), ("d", "e", 2L))
    val dup = base ++ base.map { case (s0, d0, w0) => (s0, d0, w0) } // same pairs split in two rows
    // duplicate (src,dst) rows must pre-aggregate to the summed weight
    val a = LabelProp.run(edges(base.map { case (s0, d0, w0) => (s0, d0, 2 * w0) }: _*), 2)
      .orderBy("node").as[(String, String)].collect().toSeq
    val b = LabelProp.run(edges(dup: _*).repartition(7), 2)
      .orderBy("node").as[(String, String)].collect().toSeq
    assert(a == b)
  }
}
