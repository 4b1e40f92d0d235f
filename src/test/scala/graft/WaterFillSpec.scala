package graft

import graft.operators.WaterFill
import org.apache.spark.sql.functions._

/** Water-filling budget allocation: hand-checked levels, exact budget
  * conservation (Σ alloc = min(budget, Σ avail)), the floor-test
  * regression (a floored level must not stop the scan early and leak
  * budget), and determinism of the remainder distribution.
  */
class WaterFillSpec extends SparkSpec {
  import spark.implicits._

  private def alloc(avails: Seq[(String, Long)], budget: Long): Map[String, (Long, Boolean)] =
    WaterFill(avails.toDF("domain", "avail"), "domain", "avail", budget)
      .as[(String, Long, Long, Boolean)].collect()
      .map { case (d, _, a, c) => d -> (a, c) }.toMap

  test("level splits evenly among the big domains; small ones keep everything") {
    // avail 1/5/5, budget 9 → level 4: a capped at 1, b/c get 4 each
    val got = alloc(Seq("a" -> 1L, "b" -> 5L, "c" -> 5L), 9L)
    assert(got("a") == (1L, true))
    assert(got("b") == (4L, false))
    assert(got("c") == (4L, false))
  }

  test("floored candidate level must not stop the scan early (budget conserved)") {
    // avails 3/3/3/10, budget 14: floor(14/4)=3 ≤ 3 would wrongly stop
    // at j=1 and allocate 13; the real level is 5
    val got = alloc(Seq("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 10L), 14L)
    assert(got("d") == (5L, false), s"got $got")
    assert(got.values.map(_._1).sum == 14L)
  }

  test("remainder tokens go one each to the lexicographically-first uncapped domains") {
    // avail 10/10/10, budget 11 → level 3, extra 2 → a,b get 4, c gets 3
    val got = alloc(Seq("a" -> 10L, "b" -> 10L, "c" -> 10L), 11L)
    assert(got("a") == (4L, false))
    assert(got("b") == (4L, false))
    assert(got("c") == (3L, false))
  }

  test("budget over total: everyone capped, alloc = avail") {
    val got = alloc(Seq("a" -> 2L, "b" -> 7L), 100L)
    assert(got("a") == (2L, true) && got("b") == (7L, true))
  }

  test("zero budget allocates zero to all") {
    val got = alloc(Seq("a" -> 2L, "b" -> 7L), 0L)
    assert(got.values.forall(_._1 == 0L))
  }

  test("conservation holds across a random sweep of budgets") {
    val avails = Seq("w" -> 13L, "x" -> 2L, "y" -> 40L, "z" -> 7L)
    val total = avails.map(_._2).sum
    for (b <- Seq(0L, 1L, 5L, 19L, 23L, 55L, 61L, 62L, 100L)) {
      val got = alloc(avails, b)
      assert(got.values.map(_._1).sum == math.min(b, total), s"budget $b: $got")
      // no domain exceeds its availability
      avails.foreach { case (d, a) => assert(got(d)._1 <= a, s"budget $b domain $d") }
    }
  }
}
