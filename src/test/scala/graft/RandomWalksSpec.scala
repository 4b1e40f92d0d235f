package graft

import graft.graph.RandomWalks
import org.apache.spark.sql.functions._

/** Deterministic random walks ([[graft.graph.RandomWalks]]): hand
  * graphs, dead-end behavior, draw arithmetic, determinism. */
class RandomWalksSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], steps: Int, parts: Int = 4) =
    RandomWalks.walks(edges.toDF("src", "dst").repartition(parts),
        "src", "dst", steps, salt = "t")
      .select($"walk", $"end_node", $"path")
      .as[(String, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("a single-successor cycle is forced: the walk is the cycle itself") {
    val m = run(Seq("a" -> "b", "b" -> "c", "c" -> "a"), steps = 3)
    assert(m("a") == (("a", "a,b,c,a")))
    assert(m("b") == (("b", "b,c,a,b")))
  }

  test("dead ends hold their position for the remaining steps") {
    val m = run(Seq("a" -> "b"), steps = 4)
    assert(m("a") == (("b", "a,b,b,b,b")))
    assert(m("b") == (("b", "b,b,b,b,b")))
  }

  test("branch choice follows the md5 draw over the SORTED neighbor list") {
    val m = run(Seq("s" -> "x", "s" -> "y"), steps = 1)
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("t-s-1".getBytes("UTF-8"))
    val v = BigInt(1, h.take(4)).toLong >> 4 // first 7 hex chars = 28 bits
    val expect = Seq("x", "y")((v % 2).toInt)
    assert(m("s")._1 == expect, s"draw=$v expect=$expect got=${m("s")}")
  }

  test("walks are identical at any partitioning") {
    val edges = (0 until 40).flatMap(i =>
      Seq(s"n$i" -> s"n${(i * 7 + 3) % 40}", s"n$i" -> s"n${(i * 11 + 5) % 40}"))
      .filter { case (a, b) => a != b }
    assert(run(edges, 6, parts = 1) == run(edges, 6, parts = 16))
  }
}
