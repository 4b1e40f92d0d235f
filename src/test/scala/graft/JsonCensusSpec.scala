package graft

import graft.operators.JsonCensus
import org.apache.spark.sql.functions._

/** JSON key/type census ([[graft.operators.JsonCensus.keyCensus]]):
  * raw-value capture of non-string types, null handling, histograms. */
class JsonCensusSpec extends SparkSpec {
  import spark.implicits._

  test("one parse captures every key with a classifiable value text") {
    val df = Seq(
      """{"a":1,"b":"x"}""",
      """{"a":2.5,"c":true}""",
      """{"b":"y","d":[1,2]}""",
      """{"a":null,"c":false}""",
      """{"e":{"nested":1}}""").toDF("j")
    val m = JsonCensus.keyCensus(df, "j")
      .select($"key", $"n_present", $"n_null", $"n_int", $"n_double",
        $"n_bool", $"n_array", $"n_string")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(m("a") == (("a", 3L, 1L, 1L, 1L, 0L, 0L, 0L)),
      s"a drifts int->double and carries a null: ${m("a")}")
    assert(m("b") == (("b", 2L, 0L, 0L, 0L, 0L, 0L, 2L)))
    assert(m("c") == (("c", 2L, 0L, 0L, 0L, 2L, 0L, 0L)))
    assert(m("d") == (("d", 1L, 0L, 0L, 0L, 0L, 1L, 0L)))
    // nested objects: present, but neither scalar class nor array/string
    assert(m("e")._2 == 1L && m("e")._8 == 0L)
  }

  test("census is identical at any partitioning") {
    val rows = (1 to 60).map(i => s"""{"k$i":${i % 5},"shared":"v${i % 3}"}""")
    def run(p: Int) = JsonCensus.keyCensus(rows.toDF("j").repartition(p), "j")
      .orderBy($"key").collect().toSeq
    assert(run(1) == run(16))
  }
}
