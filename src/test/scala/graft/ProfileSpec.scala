package graft

import graft.core.Profile
import org.apache.spark.sql.functions._

/** Table-profiling operators ([[graft.core.Profile]]): hand-checked
  * values on toy frames; the q245/q246/q249 oracles gate the full
  * arithmetic against DuckDB. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val toy = Seq(
    ("a", Some(1)), ("a", Some(1)), ("a", Some(2)),
    ("b", None), ("b", Some(3))).toDF("s", "x")

  test("sketchProfile: null counts exact; small-cardinality estimates near-exact") {
    val out = Profile.sketchProfile(toy, Seq(("s", $"s"), ("x", $"x")))
      .select($"col_name", $"n_nulls", $"est_distinct_e6")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("s")._1 == 0L && out("x")._1 == 1L)
    // HLL linear counting is exact-ish at tiny cardinalities
    assert(math.abs(out("s")._2 - 2e6) < 2e4, out("s"))
    assert(math.abs(out("x")._2 - 3e6) < 3e4, out("x"))
  }

  test("frequentValues: rank order, tie-break on value, shares sum within the top-k") {
    val out = Profile.frequentValues(toy, Seq(("s", $"s")), k = 2)
      .select($"rank", $"value", $"n", $"share_e6")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 3L, 600000L), (2L, "b", 2L, 400000L)))
  }

  test("dependence: a deterministic function of a column scores V = 1; independence scores near 0") {
    val df = (0 until 400).map { i =>
      (s"k${i % 4}", s"f${i % 4}", s"u${(i * 7 + i / 4) % 5}")
    }.toDF("a", "fa", "u")
    val out = Profile.dependence(df, Seq(
        ("det", $"a", $"fa"), ("ind", $"a", $"u")))
      .select($"pair", $"cramers_v_e6").as[(String, Long)].collect().toMap
    assert(out("det") == 1000000L, s"functional dependence must score 1: $out")
    assert(out("ind") < 200000L, s"shuffled pair must score low: $out")
  }
}
