package graft

import org.apache.spark.sql.functions._
import graft.stats.Privacy

/** [[graft.stats.Privacy]] — seeded-Laplace DP release (q168). */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("uniform01 is deterministic, in (0,1), and seed-sensitive") {
    val keys = (1 to 2000).map(i => s"k$i").toDF("k")
    val u = keys.select(Privacy.uniform01(col("k"), "s1").as("u"))
      .collect().map(_.getDouble(0))
    assert(u.forall(x => x > 0.0 && x < 1.0))
    // replay: identical draw
    val u2 = keys.select(Privacy.uniform01(col("k"), "s1").as("u"))
      .collect().map(_.getDouble(0))
    assert(u.sameElements(u2))
    // different seed decorrelates
    val v = keys.select(Privacy.uniform01(col("k"), "s2").as("u"))
      .collect().map(_.getDouble(0))
    assert(u.zip(v).count { case (a, b) => a == b } < 3)
    // roughly uniform: mean near 1/2
    assert(math.abs(u.sum / u.length - 0.5) < 0.02)
  }

  test("laplaceNoise has ~Laplace(b) moments and is symmetric") {
    val keys = (1 to 20000).map(i => s"k$i").toDF("k")
    val b = 3.0
    val n = keys.select(Privacy.laplaceNoise(col("k"), "s", b).as("n"))
      .collect().map(_.getDouble(0))
    // E|X| = b for Laplace(0, b); E[X] = 0
    assert(math.abs(n.map(math.abs).sum / n.length - b) < 0.15)
    assert(math.abs(n.sum / n.length) < 0.15)
  }

  test("dpRelease clamps contributions, noises, and suppresses") {
    // group a: 100 docs of 10 chars; group b: 3 docs of 1e9 chars
    // (clamp catches the oversize docs; threshold suppresses group b)
    val docs = ((1 to 100).map(i => ("a", "s", 10L)) ++
      (1 to 3).map(i => ("b", "s", 1000000000L)))
      .toDF("lang", "source", "n_chars")
    val out = Privacy.dpRelease(docs, Seq("lang", "source"), "t",
      eps = 1.0, clampChars = 500L, charsCol = "n_chars",
      releaseMin = 10.0)
      .collect()
    assert(out.length == 1 && out(0).getString(0) == "a")
    val (dpN, dpM) = (out(0).getDouble(2), out(0).getDouble(3))
    // count noise is Laplace(1): within a wide sanity band of truth
    assert(math.abs(dpN - 100.0) < 15.0)
    // mass = 100*10 clamped at 500 each = 1000, noise Laplace(500)
    assert(math.abs(dpM - 1000.0) < 5000.0)
    // high epsilon -> noise collapses toward the true value
    val tight = Privacy.dpRelease(docs, Seq("lang", "source"), "t",
      eps = 1e6, clampChars = 500L, charsCol = "n_chars",
      releaseMin = 10.0).collect()(0)
    assert(math.abs(tight.getDouble(2) - 100.0) < 0.01)
    assert(math.abs(tight.getDouble(3) - 1000.0) < 0.01)
  }

  test("dpRelease whole-group presence is noise-thresholded, not exact") {
    // a group sitting exactly at the threshold can fall either side
    // depending only on its own draw — but NEVER appears with a noised
    // count below the threshold (the release invariant)
    val docs = (1 to 400).map(i => (s"g${i % 40}", "s", 5L))
      .toDF("lang", "source", "n_chars")
    val out = Privacy.dpRelease(docs, Seq("lang", "source"), "u",
      eps = 0.5, clampChars = 100L, charsCol = "n_chars",
      releaseMin = 10.0)
    assert(out.filter(col("dp_n_docs") < 10.0).isEmpty)
  }
}
