package graft

import graft.text.Budget
import org.apache.spark.sql.functions._

/** Budgeted selection: contiguous score-ordered prefix, per-group
  * budgets, determinism under repartitioning. */
class BudgetSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // (id, group, score, tokens)
    (1L, "a", 9.0, 40L),
    (2L, "a", 8.0, 40L),
    (3L, "a", 7.0, 40L), // cum 120 > 100: cut here
    (4L, "a", 6.0, 5L),  // would fit alone, but selection is a prefix
    (5L, "b", 1.0, 100L),
    (6L, "b", 0.5, 1L)
  ).toDF("id", "g", "score", "tokens")

  test("keeps the best-scoring contiguous prefix within each group's budget") {
    val kept = Budget.selectUnderBudget(docs, Seq("g"),
        col("score"), col("tokens"), col("id"), budget = 100L)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 5L))
  }

  test("ties break by the tiebreak column, not partition order") {
    val tied = Seq((10L, "x", 1.0, 60L), (11L, "x", 1.0, 60L))
      .toDF("id", "g", "score", "tokens")
    def run(df: org.apache.spark.sql.DataFrame) =
      Budget.selectUnderBudget(df, Seq("g"),
          col("score"), col("tokens"), col("id"), budget = 60L)
        .select($"id").as[Long].collect().toSeq
    assert(run(tied) == Seq(10L) && run(tied.repartition(5)) == Seq(10L))
  }
}
