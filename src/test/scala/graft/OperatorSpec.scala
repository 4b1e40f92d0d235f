package graft

import org.apache.spark.sql.functions._
import graft.operators.{Complete, Harmonize, UniqueKeyFullJoin}

class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("UniqueKeyFullJoin: unique rows match, ambiguous rows pass through unmatched") {
    // left: key a unique, key b duplicated; right: key a unique, key c unique
    val l = Seq(("a", "l1"), ("b", "l2"), ("b", "l3")).toDF("k", "lv")
    val r = Seq(("a", "r1"), ("c", "r2")).toDF("k", "rv")
    val out = UniqueKeyFullJoin(l, r, Seq("k")).collect()
    assert(out.length == 4) // a matched, c right-only, b×2 appended unmatched
    val matched = out.filter(x => x.getAs[String]("lv") != null && x.getAs[String]("rv") != null)
    assert(matched.map(_.getAs[String]("k")).toSeq == Seq("a"))
    val bRows = out.filter(_.getAs[String]("k") == "b")
    assert(bRows.length == 2 && bRows.forall(_.getAs[String]("rv") == null))
  }

  test("Harmonize.coalesceInto merges drift columns, tolerates missing sources") {
    val df = Seq((Some("x"), None: Option[String]), (None, Some("y")), (None, None))
      .toDF("v1_name", "v2_name")
    val out = Harmonize.coalesceInto(df, "name", Seq("v1_name", "v2_name", "v3_name"))
    assert(out.columns.toSeq == Seq("name"))
    assert(out.as[Option[String]].collect().toSeq == Seq(Some("x"), Some("y"), None))
  }

  test("Harmonize.recode maps dictionary values, keeps unmatched") {
    val df = Seq("gil", "cast_net", "??").toDF("gear")
    val out = df.select(Harmonize.recode($"gear",
      Map("gil" -> "gill_net", "??" -> "other")).as("g")).as[String].collect().toSeq
    assert(out == Seq("gill_net", "cast_net", "other"))
  }

  test("Harmonize.unionByNameAll null-fills missing columns") {
    val a = Seq((1, "x")).toDF("id", "only_a")
    val b = Seq((2, 3.5)).toDF("id", "only_b")
    val u = Harmonize.unionByNameAll(Seq(a, b))
    assert(u.columns.toSet == Set("id", "only_a", "only_b"))
    assert(u.count() == 2)
    assert(u.filter($"id" === 2).head().getAs[String]("only_a") == null)
  }

  test("Complete fills the grid with nulls for absent combinations") {
    val obs = Seq((1, "a", 10.0)).toDF("t", "g", "v")
    val grid = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b")).toDF("t", "g")
    val out = Complete.complete(obs, grid, Seq("t", "g"))
    assert(out.count() == 4)
    assert(out.filter($"v".isNotNull).count() == 1)
  }
}
