package graft

import graft.graph.MarkovAttribution
import org.apache.spark.sql.functions._

/** Hand-built chains for the attribution machinery: absorption on a
  * known two-step funnel, horizon sensitivity, channel removal
  * semantics, and the tagged multi-chain frame. */
class MarkovAttributionSpec extends SparkSpec {
  import spark.implicits._

  private val funnel = Seq(
    ("start", "A", 10L), ("A", "conv", 5L), ("A", "null", 5L))

  test("two-step funnel absorbs at exactly 0.5") {
    val p = MarkovAttribution.normalize(funnel.toDF("src", "dst", "n"))
    val got = MarkovAttribution.absorption(p, squarings = 2)
      .collect().head.getDouble(0)
    assert(got === 0.5)
  }

  test("horizon too short to reach conv gives 0") {
    // start→A→B→conv needs 3 steps; 2^1 = 2 steps cannot absorb
    val chain = Seq(("start", "A", 1L), ("A", "B", 1L), ("B", "conv", 1L))
    val p = MarkovAttribution.normalize(chain.toDF("src", "dst", "n"))
    assert(MarkovAttribution.absorption(p, squarings = 1)
      .collect().head.getDouble(0) === 0.0)
    assert(MarkovAttribution.absorption(p, squarings = 2)
      .collect().head.getDouble(0) === 1.0)
  }

  test("removing the only channel redirects its traffic to null") {
    val removed = MarkovAttribution.removeChannel(
      funnel.toDF("src", "dst", "n"), "A")
    val rows = removed.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows === Set(("start", "null", 10L)))
    val p = MarkovAttribution.normalize(removed)
    assert(MarkovAttribution.absorption(p, squarings = 3)
      .collect().head.getDouble(0) === 0.0)
  }

  test("tagged frame keeps chains independent") {
    val tagged = funnel.toDF("src", "dst", "n").withColumn("chain", lit("f"))
      .unionByName(MarkovAttribution.removeChannel(
        funnel.toDF("src", "dst", "n"), "A").withColumn("chain", lit("rm")))
    val pc = MarkovAttribution.absorption(
      MarkovAttribution.normalize(tagged, Seq("chain")),
      squarings = 2, tagCols = Seq("chain"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pc("f") === 0.5)
    assert(pc.getOrElse("rm", 0.0) === 0.0)
  }
}
