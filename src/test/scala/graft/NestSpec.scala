package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Nest, WideNest}

/** The nest/unnest kernel and the wide→nested ingest move, checked
  * against the reference's own unit fixture (FIXTURES.md F1, from
  * `tests/testthat/test-pre-process-landings.R`). */
class NestSpec extends SparkSpec {
  import spark.implicits._

  test("nest → unnest round trip preserves rows and order") {
    val df = Seq((1, 2, "a"), (1, 1, "b"), (2, 3, "c")).toDF("k", "ord", "v")
    val nested = Nest.nest(df, Seq("k"), Seq("ord", "v"), "ord", "items")
    assert(nested.count() == 2)
    val k1 = nested.filter($"k" === 1).select($"items").head().getSeq[Row](0)
    assert(k1.map(_.getAs[String]("v")) == Seq("b", "a")) // sorted by ord
    val back = Nest.unnest(nested, "items")
    assert(back.select("k", "ord", "v").as[(Int, Int, String)].collect().toSet ==
      Set((1, 2, "a"), (1, 1, "b"), (2, 3, "c")))
  }

  test("unnest keepEmpty preserves parents with empty arrays (explode_outer)") {
    val df = Seq((1, Seq((1, "a"))), (2, Seq.empty[(Int, String)]))
      .toDF("k", "items")
      .withColumn("items", $"items".cast("array<struct<ord:int,v:string>>"))
    assert(Nest.unnest(df, "items", keepEmpty = false).count() == 1)
    assert(Nest.unnest(df, "items", keepEmpty = true).count() == 2)
  }

  test("WideNest melts index-suffixed repeat groups (F1 fixture shape)") {
    val df = Seq(
      ("123",
        "sp01", "food", "10",
        "sp02", "sale", "20")
    ).toDF("_id",
      "species_group.0.species_group/species",
      "species_group.0.species_group/food_or_sale",
      "species_group.0.species_group/no_fish_by_length_group/no_individuals_5_10",
      "species_group.1.species_group/species",
      "species_group.1.species_group/food_or_sale",
      "species_group.1.species_group/no_fish_by_length_group/no_individuals_5_10")
    val nested = WideNest.nestRepeats(df, "species_group", "species_group")
    assert(nested.columns.toSeq == Seq("_id", "species_group"))
    val arr = nested.head().getSeq[Row](1)
    assert(arr.length == 2) // golden: two species rows
    assert(arr.map(_.getAs[String]("species_group_species")) == Seq("sp01", "sp02"))
    assert(arr.map(_.getAs[Int]("n")) == Seq(0, 1))
  }

  test("WideNest drops all-null repeat groups (empty-group semantics)") {
    val df = Seq(("1", "sp01", null: String)).toDF("_id",
      "g.0.species", "g.1.species")
    val arr = WideNest.nestRepeats(df, "g", "g").head().getSeq[Row](1)
    assert(arr.length == 1)
  }

  test("meanOfNumbersInName: golden values from the reference fixture") {
    // length class 5_10 → mean length 7.5; over60 name → 60 (recorded
    // length is then substituted downstream)
    val df = Seq("no_individuals_5_10", "no_individuals_over60", "nothing")
      .toDF("name")
      .select(WideNest.meanOfNumbersInName(col("name")).as("m"))
    val got = df.as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(7.5), Some(60.0), None))
  }

  test("nestOnto: no-attachment parents keep an EMPTY array (not null, row kept), surviving parquet") {
    // pt_nest_attachments edge (`R/pt_nest_attachments.R:61-67`): the
    // nested frame is EMPTIED for parents without children
    val parents = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("_id", "payload")
    val children = Seq((1L, 0, "u0"), (1L, 1, "u1")).toDF("_id", "n", "url")
    val nested = Nest.nestOnto(parents, children, Seq("_id"),
      Seq("n", "url"), "n", "_attachments")
    val dir = java.nio.file.Files.createTempDirectory("nestonto").toString
    nested.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 3, "parents without children must not drop")
    val byId = back.collect().map(r =>
      r.getAs[Long]("_id") -> r.getSeq[Row](r.fieldIndex("_attachments"))).toMap
    assert(byId(1L).map(_.getAs[String]("url")) == Seq("u0", "u1"))
    // empty, NOT null — the distinction the reference encodes
    assert(byId(2L) != null && byId(2L).isEmpty)
    assert(byId(3L) != null && byId(3L).isEmpty)
    assert(back.filter(col("_attachments").isNull).count() == 0)
    // keep_empty unnest downstream: empty-array parents survive
    assert(Nest.unnest(back, "_attachments", keepEmpty = true).count() == 4)
    assert(Nest.unnest(back, "_attachments", keepEmpty = false).count() == 2)
  }
}
