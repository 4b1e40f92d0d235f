package graft

import org.apache.spark.sql.functions._
import graft.dedup.Components

@org.scalatest.tags.Slow
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connected(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to one component rooted at the minimum") {
    val got = comps(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    assert(got == (1L to 6L).map(_ -> 1L).toMap)
  }

  test("separate components, reversed and duplicated edges") {
    val got = comps(Seq(
      (9L, 7L), (7L, 8L), (9L, 7L), // component rooted at 7
      (2L, 1L),                     // component rooted at 1
      (5L, 5L)))                    // self-loop: no edge, node vanishes
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("two stars joined by a bridge merge into one component") {
    val star1 = (2L to 5L).map(v => (1L, v))
    val star2 = (12L to 15L).map(v => (11L, v))
    val got = comps(star1 ++ star2 ++ Seq((5L, 15L)))
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == ((1L to 5L) ++ (11L to 15L)).toSet)
  }

  test("random graph matches a single-node union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(200)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    // reference: classic union-find on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
    assert(comps(edges) == expected)
  }

  test("electCanonical: best quality wins per cluster, ties to smallest id") {
    import spark.implicits._
    val docs = Seq( // cluster {1,2,3}: 2 has most tokens; {7,8}: tie -> 7
      (1L, 10L), (2L, 30L), (3L, 20L), (7L, 5L), (8L, 5L), (9L, 99L))
      .toDF("doc_id", "n_tokens")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("da", "db")
    val out = graft.dedup.Components.electCanonical(
        docs, "doc_id", "n_tokens", pairs, "da", "db")
      .select($"doc_id", $"component", $"is_canonical")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (7L, 7L, true), (8L, 7L, false)))
    // isolated doc 9 is absent by contract
    assert(!out.exists(_._1 == 9L))
  }
}
