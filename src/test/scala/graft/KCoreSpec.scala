package graft

import graft.core.Tables
import graft.graph.KCore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("triangle plus pendant: core nodes get coreness 2, the tendril 1") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst")
    val out = KCore.coreness(edges, iters = 4)
      .select($"node", $"degree", $"coreness")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      "a" -> ((2L, 2L)), "b" -> ((2L, 2L)), "c" -> ((3L, 2L)), "d" -> ((1L, 1L))))
  }

  test("two cliques bridged by a path: coreness separates clique depth from degree") {
    // K4 on 1..4, K3 on 5..7, bridge 4-5
    val k4 = for (i <- 1 to 4; j <- (i + 1) to 4) yield (s"n$i", s"n$j")
    val k3 = for (i <- 5 to 7; j <- (i + 1) to 7) yield (s"n$i", s"n$j")
    val edges = (k4 ++ k3 :+ ("n4", "n5")).toDF("src", "dst")
    val core = KCore.coreness(edges, iters = 6)
      .select($"node", $"coreness").as[(String, Long)].collect().toMap
    (1 to 4).foreach(i => assert(core(s"n$i") == 3L, s"K4 member n$i"))
    (5 to 7).foreach(i => assert(core(s"n$i") == 2L, s"K3 member n$i"))
  }

  /** The q259 link graph, replicated from GraphQueries.linkEdges. */
  private def docGraph: DataFrame = {
    val m = 101
    Tables.documents(spark, sf).select($"doc_id")
      .select($"doc_id", explode(array(
        ($"doc_id" * 7 + 13) % m,
        ($"doc_id" * 13 + 29) % m,
        ($"doc_id" * 31 + 7) % m)).as("t"))
      .select(concat(lit("d"), $"doc_id" % m).as("src"),
        concat(lit("d"), $"t").as("dst"))
      .filter($"src" =!= $"dst")
  }

  test("six H-index rounds reach the fixpoint on the doc link graph (round-6 = round-8)") {
    val r6 = KCore.coreness(docGraph, iters = 6)
      .select($"node", $"coreness").as[(String, Long)].collect().toMap
    val r8 = KCore.coreness(docGraph, iters = 8)
      .select($"node", $"coreness").as[(String, Long)].collect().toMap
    assert(r6 == r8, "H-index iteration not converged after 6 rounds")
  }

  test("edge contract: empty graphs, self-loops and null endpoints are dropped, not crashed") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(KCore.coreness(empty, iters = 2).count() == 0)
    val loops = Seq(("a", "a"), ("a", "b"), (null, "c"), ("c", null))
      .toDF("src", "dst")
    val out = KCore.coreness(loops, iters = 2)
      .select($"node", $"degree", $"coreness").as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // only the a-b edge survives: both endpoints degree 1, coreness 1
    assert(out == Map("a" -> ((1L, 1L)), "b" -> ((1L, 1L))))
  }

  test("coreness is bounded by degree and the k-core property holds at the fixpoint") {
    val out = KCore.coreness(docGraph, iters = 8)
      .select($"node", $"degree", $"coreness").as[(String, Long, Long)].collect()
    out.foreach { case (n, deg, c) =>
      assert(c >= 1 && c <= deg, s"$n coreness $c outside [1, degree=$deg]")
    }
    // peeling check: within the subgraph induced by {coreness >= kmax},
    // every node keeps >= kmax neighbours — the defining k-core property
    val core = out.map(r => r._1 -> r._3).toMap
    val kmax = core.values.max
    val keep = core.filter(_._2 >= kmax).keySet
    val und = docGraph.select($"src", $"dst").distinct()
      .as[(String, String)].collect()
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    keep.foreach { n =>
      val inDeg = und.count { case (a, b) => a == n && keep(b) }
      assert(inDeg >= kmax, s"$n has only $inDeg neighbours inside the $kmax-core")
    }
  }
}
