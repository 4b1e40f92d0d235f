package graft

import org.apache.spark.sql.functions._
import graft.core.Expectations
import graft.core.Expectations.RowRule

/** [[graft.core.Expectations]] — declarative data-contract audit (q171). */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val child = Seq(
    (1L, Some(10.0), "O", Some(100L)),
    (2L, Some(-5.0), "X", Some(100L)),  // bad range, bad enum
    (3L, None, "F", Some(999L)),        // null value, orphan fk
    (3L, Some(20.0), "P", None))        // dup key, null fk (orphan)
    .toDF("id", "price", "status", "parent_id")
  private val parent = Seq(100L, 101L).toDF("pid")

  test("audit counts each violation class exactly once, in one report") {
    val rep = Expectations.audit(
      child,
      rowRules = Seq(
        RowRule("price_pos", col("price") > 0.0),
        RowRule("status_enum", col("status").isin("O", "F", "P"))),
      uniqueKey = Some(Seq("id")),
      foreignKeys = Seq(("parent", parent, "parent_id", "pid")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep("price_pos") == (4L, 2L))      // -5.0 and the null price
    assert(rep("status_enum") == (4L, 1L))    // "X"
    assert(rep("unique:id") == (4L, 1L))      // one extra row on id=3
    assert(rep("fk:parent") == (4L, 2L))      // 999 and null parent_id
  }

  test("a clean table reports zero violations with full row counts") {
    val clean = Seq((1L, 1.0, "O", 100L), (2L, 2.0, "F", 101L))
      .toDF("id", "price", "status", "parent_id")
    val rep = Expectations.audit(
      clean,
      rowRules = Seq(RowRule("price_pos", col("price") > 0.0)),
      uniqueKey = Some(Seq("id")),
      foreignKeys = Seq(("parent", parent, "parent_id", "pid")))
    assert(rep.filter(col("n_bad") =!= 0L).isEmpty)
    assert(rep.filter(col("n_rows") =!= 2L).isEmpty)
  }

  test("row rules fold into a single aggregation over one scan") {
    val df = Expectations.audit(
      child,
      rowRules = Seq(
        RowRule("a", col("price") > 0.0),
        RowRule("b", col("status").isin("O")),
        RowRule("c", col("id") < 100L)))
    val p = df.queryExecution.executedPlan.toString
    // 3 rules, one scan: no join, one aggregate pair (partial+final)
    assert(!p.contains("Join"), s"row rules must not join:\n$p")
    assert("LocalTableScan|Scan".r.findAllIn(p).size <= 2, s"one scan expected:\n$p")
  }
}
