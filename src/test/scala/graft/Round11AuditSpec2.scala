package graft

import graft.graph.MarkovAttribution
import graft.similarity.GridDbscan
import graft.text.PrefixSharing
import org.apache.spark.sql.functions._

/** Latent-edge audit of the round-11 extension kernels (the audit
  * class that has caught a real defect three rounds running): empty
  * inputs, degenerate sizes, and boundary regimes that production
  * deltas will eventually hit. */
class Round11AuditSpec2 extends SparkSpec {
  import spark.implicits._

  test("GridDbscan: extend from an EMPTY base equals a fresh build") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "x", "y")
    val delta = Seq((1L, 0L, 0L), (2L, 50L, 0L), (3L, 0L, 50L))
    val idx = GridDbscan.index(empty, "id", "x", "y", 100L, 3)
    val ext = GridDbscan.labels(
        GridDbscan.extend(idx, delta.toDF("id", "x", "y"), "id", "x", "y"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val reb = GridDbscan.cluster(delta.toDF("id", "x", "y"),
        "id", "x", "y", 100L, 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ext === reb)
    assert(ext.forall(_._2 == "core"))
  }

  test("GridDbscan: minPts = 1 makes every point a core singleton or cluster") {
    val out = GridDbscan.cluster(
        Seq((1L, 0L, 0L), (2L, 10000L, 0L)).toDF("id", "x", "y"),
        "id", "x", "y", 100L, 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set((1L, "core", 1L), (2L, "core", 2L)))
  }

  test("PrefixSharing: empty input, single row, empty-string keys") {
    val empty = Seq.empty[(Long, String)].toDF("id", "k")
    assert(PrefixSharing.neighborLcp(empty, "id", "k").count() === 0L)
    val single = PrefixSharing.reusablePrefix(
      Seq((7L, "abc")).toDF("id", "k"), "id", "k").collect()
    assert(single.length === 1 && single.head.getLong(2) === 0L)
    // empty strings sort first and share a 0-length prefix with anything
    val out = PrefixSharing.neighborLcp(
        Seq((1L, ""), (2L, ""), (3L, "a")).toDF("id", "k"), "id", "k")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(1L) === -1L && out(2L) === 0L && out(3L) === 0L)
  }

  test("MarkovAttribution: empty counts absorb nothing; caller outer-join contract") {
    val empty = Seq.empty[(String, String, Long)].toDF("src", "dst", "n")
    val p = MarkovAttribution.normalize(empty)
    // only the two absorbing self-loops survive; start never reaches conv
    assert(MarkovAttribution.absorption(p, 2).collect().head.getDouble(0)
      === 0.0)
    // tagged variant with no tags yields NO rows — q330-style callers
    // must outer-join their tag list (this is the documented contract)
    val pt = MarkovAttribution.normalize(
      empty.withColumn("chain", lit("z")).limit(0), Seq("chain"))
    assert(MarkovAttribution.absorption(pt, 2, Seq("chain")).count() === 0L)
  }

  test("MarkovAttribution: self-loop channel mass stays conservative") {
    // a channel looping on itself forever must absorb at ~0, not blow up
    val loop = Seq(("start", "A", 1L), ("A", "A", 9L), ("A", "conv", 1L))
    val p = MarkovAttribution.normalize(loop.toDF("src", "dst", "n"))
    val a5 = MarkovAttribution.absorption(p, 5).collect().head.getDouble(0)
    assert(a5 > 0.9 && a5 <= 1.0) // 32 steps of 10% escape ≈ 1 − 0.9³²
  }

  test("Survival: duration 0 events are a valid first step") {
    val out = graft.stats.Survival.kaplanMeier(
      Seq((0L, true), (0L, false), (5L, false)).toDF("dur", "observed"),
      "dur", "observed").collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 0L && out.head.getLong(1) === 3L)
    assert(math.abs(out.head.getDouble(4) - 0.666667) < 1e-6)
  }
}
