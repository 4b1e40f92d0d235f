package graft

import graft.functions.HeavyHitters
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters sketch: exactness when capacity covers the
  * distinct count (under any partitioning), and the classic MG
  * guarantees in the approximation regime — estimates never exceed
  * true counts, undercount by at most n/(capacity+1), and every item
  * above that frequency is present.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  HeavyHitters.register(spark)

  private def summary(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(call_function("heavy_hitters", col("item"), lit(cap)).as("hh"))
      .select(explode(col("hh")).as("s"))
      .select(col("s.item"), col("s.cnt"))
      .as[(String, Long)].collect().toMap

  test("capacity >= distinct count: exact frequency table, stable under repartitioning") {
    val items = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c") ++
      Seq.fill(3)("d") ++ Seq("e")).map(Tuple1(_))
    val truth = items.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 7, 32)) {
      val got = summary(items.toDF("item").repartition(parts), cap = 8)
      assert(got == truth, s"parts=$parts")
    }
  }

  test("small capacity: MG undercount and coverage guarantees hold") {
    // 1000 items: one dominant (400), a mid (150), and 450 singleton ids
    val items = (Seq.fill(400)("hot") ++ Seq.fill(150)("warm") ++
      (0 until 450).map(i => s"cold$i")).map(Tuple1(_))
    val n = items.size
    val cap = 9
    val bound = n / (cap + 1) // 100
    val truth = items.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val got = summary(items.toDF("item").repartition(5), cap)
    assert(got.size <= cap, s"summary exceeds capacity: ${got.size}")
    got.foreach { case (k, est) =>
      assert(est <= truth(k), s"$k overestimated: $est > ${truth(k)}")
      assert(est >= truth(k) - bound, s"$k undercounted past the bound")
    }
    // every item with true frequency above n/(cap+1) must be present
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(got.contains(k), s"heavy item $k missing from summary")
    }
  }

  test("eval orders by (cnt desc, item asc) and groupBy keys stay independent") {
    val df = Seq(
      ("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "z")).toDF("g", "item")
    val rows = df.groupBy(col("g"))
      .agg(call_function("heavy_hitters", col("item"), lit(4)).as("hh"))
      .select(col("g"), posexplode(col("hh")).as(Seq("i", "s")))
      .select(col("g"), col("i"), col("s.item"), col("s.cnt"))
      .as[(String, Int, String, Long)].collect().toSet
    assert(rows == Set(
      ("g1", 0, "x", 2L), ("g1", 1, "y", 1L), ("g2", 0, "z", 1L)))
  }
}
