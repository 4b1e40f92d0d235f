package graft

import graft.text.Sft

/** SFT pair assembly on a hand-checked transcript: prompts are the
  * exact ordered history, only target-role turns become examples,
  * conversations don't leak into each other. */
class SftSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    // conv A: u1 a1 u2 a2
    ("A", 1L, "user", "hi"),
    ("A", 2L, "assistant", "hello"),
    ("A", 3L, "user", "how?"),
    ("A", 4L, "assistant", "fine"),
    // conv B: single user turn -> no examples
    ("B", 1L, "user", "lonely"),
    // conv C: starts with assistant -> empty prompt example
    ("C", 1L, "assistant", "welcome")
  ).toDF("conv", "ord", "role", "text")

  private lazy val out = Sft.pairs(turns, Seq("conv"), Seq("ord"),
      "role", "text", targetRole = "assistant")
    .as[(String, Int, Int, String, String)].collect()
    .map(r => (r._1, r._2) -> r).toMap

  test("every assistant turn becomes one example with the exact history") {
    assert(out.size == 3)
    val a2 = out(("A", 2))
    assert(a2._3 == 1 && a2._4 == "user: hi" && a2._5 == "hello")
    val a4 = out(("A", 4))
    assert(a4._3 == 3 && a4._5 == "fine")
    assert(a4._4 == "user: hi\nassistant: hello\nuser: how?")
  }

  test("user-only conversations yield nothing; a leading assistant turn gets an empty prompt") {
    assert(!out.keys.exists(_._1 == "B"))
    val c1 = out(("C", 1))
    assert(c1._3 == 0 && c1._4 == "" && c1._5 == "welcome")
  }

  test("prompts are partitioning-invariant (total order, not arrival order)") {
    val shuffled = Sft.pairs(turns.repartition(5), Seq("conv"), Seq("ord"),
        "role", "text", targetRole = "assistant")
      .as[(String, Int, Int, String, String)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(shuffled == out)
  }
}
