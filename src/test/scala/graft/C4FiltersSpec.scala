package graft

import graft.text.C4Filters
import org.apache.spark.sql.functions._

/** C4 line/document cleaning rules: hand-checked line survival, doc
  * drops, and the map-only plan shape. */
@org.scalatest.tags.Slow
class C4FiltersSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "First proper sentence here.\nSecond decent line follows!\nIs this a question?"

  test("line rules: punctuation, min words, boilerplate phrases") {
    val docs = Seq(
      (1L, good + "\nno terminal punctuation\nTwo words.\nSee our Privacy Policy now."))
      .toDF("doc_id", "text")
    val r = C4Filters.clean(docs, "text").head()
    assert(r.getAs[Long]("n_lines") == 6L)
    assert(r.getAs[Long]("n_kept_lines") == 3L, "only the three good lines survive")
    assert(!r.getAs[Boolean]("doc_dropped"))
    assert(r.getAs[String]("cleaned") == good)
  }

  test("document rules: lorem ipsum, braces, too few surviving lines") {
    val docs = Seq(
      (1L, "Lorem Ipsum dolor sit amet.\n" + good), // case-insensitive lorem
      (2L, "code marker { inside }.\n" + good),
      (3L, "Only one good line survives.\nbare line\nanother bare"),
      (4L, good))
      .toDF("doc_id", "text")
    val out = C4Filters.clean(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("doc_dropped"))
    assert(out(2L).getAs[Boolean]("doc_dropped"))
    assert(out(3L).getAs[Boolean]("doc_dropped"), "1 surviving line < 3")
    assert(!out(4L).getAs[Boolean]("doc_dropped"))
    assert(out(1L).getAs[String]("cleaned") == "")
    // filter arm: one survivor, text replaced by the cleaned lines
    val kept = C4Filters.filterDocs(docs, "text").as[(Long, String)].collect()
    assert(kept.toSeq == Seq((4L, good)))
  }

  test("the whole bundle plans as a map-only projection") {
    val docs = Seq((1L, good)).toDF("doc_id", "text")
    val plan = C4Filters.clean(docs, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join") &&
      !plan.contains("Generate"), s"C4 rules must not shuffle/explode:\n$plan")
  }
}
