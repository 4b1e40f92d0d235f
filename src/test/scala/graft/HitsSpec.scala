package graft

import graft.graph.Hits
import org.apache.spark.sql.functions._

/** HITS hubs/authorities: hand-checked fixture geometry (a pure hub, a
  * pure authority), mass conservation under the L1 renormalization,
  * and bit-identical results under repartitioning (the integer-exact
  * contract the q164 oracle replays).
  */
@org.scalatest.tags.Slow
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000000L

  test("star fixture: the pointed-to node is the authority, pointers are hubs") {
    // h1,h2,h3 all point at a; a points at nothing
    val e = Seq(("h1", "a", 1L), ("h2", "a", 1L), ("h3", "a", 1L))
      .toDF("src", "dst", "w")
    val out = Hits.run(e, iters = 2, scale = S)
      .as[(String, Long, Long)].collect().map { case (k, a, h) => k -> ((a, h)) }.toMap
    // a holds ALL authority mass; hubs hold none
    assert(out("a")._1 == S, s"authority mass: ${out("a")}")
    assert(Seq("h1", "h2", "h3").forall(out(_)._1 == 0L))
    // a is no hub; the three pointers split hub mass exactly (S/3 each
    // after truncating renormalization)
    assert(out("a")._2 == 0L)
    val hubs = Seq("h1", "h2", "h3").map(out(_)._2)
    assert(hubs.distinct.size == 1 && hubs.head == S / 3, s"hubs: $hubs")
  }

  test("weighted edges count: a double-weight pointer is the bigger hub") {
    val e = Seq(("big", "a", 2L), ("small", "a", 1L)).toDF("src", "dst", "w")
    val out = Hits.run(e, iters = 2, scale = S)
      .as[(String, Long, Long)].collect().map { case (k, a, h) => k -> ((a, h)) }.toMap
    assert(out("big")._2 == 2 * out("small")._2)
  }

  test("L1 mass ≈ scale each side (truncation sheds < n units)") {
    val docs = (0 until 500)
    val e = docs.flatMap(i => Seq((s"d${i % 23}", s"d${(i * 7 + 13) % 23}", 1L),
        (s"d${i % 23}", s"d${(i * 13 + 29) % 23}", 1L)))
      .toDF("src", "dst", "w").filter(col("src") =!= col("dst"))
    val out = Hits.run(e, iters = 3, scale = S).as[(String, Long, Long)].collect()
    val (aMass, hMass) = (out.map(_._2).sum, out.map(_._3).sum)
    assert(aMass <= S && aMass > S - out.length, s"auth mass $aMass")
    assert(hMass <= S && hMass > S - out.length, s"hub mass $hMass")
  }

  test("bit-identical under repartitioning") {
    val e = (0 until 300).map(i => (s"d${i % 17}", s"d${(i * 5 + 3) % 17}", 1L + i % 3))
      .toDF("src", "dst", "w").filter(col("src") =!= col("dst"))
    val base = Hits.run(e.coalesce(1), iters = 3, scale = S)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val re = Hits.run(e.repartition(13), iters = 3, scale = S)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(base == re)
  }
}
