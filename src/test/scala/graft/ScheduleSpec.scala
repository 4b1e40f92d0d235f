package graft

import graft.text.Schedule
import org.apache.spark.sql.functions._

/** Stride schedule: proportional interleave, prefix-as-filter
  * semantics, determinism under repartitioning. */
class ScheduleSpec extends SparkSpec {
  import spark.implicits._

  // source a: 8 docs weight 8; source b: 4 docs weight 4 — a emits 2:1
  private def docs = ((1L to 8L).map((_, "a", 8L)) ++ (101L to 104L).map((_, "b", 4L)))
    .toDF("id", "src", "w")

  test("a t-fraction prefix holds ~t of every source") {
    val keyed = Schedule.withScheduleKey(docs, "id", "src", "w")
    val half = Schedule.prefixCensus(keyed, "id", "src", Schedule.Scale / 2)
      .select($"src", $"n_docs").as[(String, Long)].collect().toMap
    assert(half == Map("a" -> 4L, "b" -> 2L))
    val full = Schedule.prefixCensus(keyed, "id", "src", Schedule.Scale)
      .select($"src", $"n_docs").as[(String, Long)].collect().toMap
    assert(full == Map("a" -> 8L, "b" -> 4L))
  }

  test("keys interleave sources rather than concatenating them") {
    val keyed = Schedule.withScheduleKey(docs, "id", "src", "w")
      .orderBy($"schedule_key", $"src", $"id")
      .select($"src").as[String].collect().toSeq
    // first three virtual-time slots contain both sources (2:1 weights),
    // not an 8-long run of "a"
    assert(keyed.take(3).toSet == Set("a", "b"))
  }

  test("schedule keys are identical under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Schedule.withScheduleKey(df, "id", "src", "w")
        .select($"id", $"schedule_key").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }
}
