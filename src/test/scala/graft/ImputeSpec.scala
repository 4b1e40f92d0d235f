package graft

import org.apache.spark.sql.functions._
import graft.stats.Impute

class ImputeSpec extends SparkSpec {
  import spark.implicits._

  test("missing rows take the observed y of the nearest-yhat donor") {
    // y ≈ 10x exactly on observed rows → slope 10, intercept 0, so
    // yhat = 10x and the nearest donor is simply the nearest-x observed
    val df = Seq[(String, Long, Double, java.lang.Double)](
      ("g", 1L, 1.0, 10.0),
      ("g", 2L, 2.0, 20.0),
      ("g", 3L, 6.0, 60.0),
      ("g", 4L, 2.4, null), // nearest observed x: 2.0 → donor y 20.0
      ("g", 5L, 5.0, null)  // nearest observed x: 6.0 → donor y 60.0
    ).toDF("g", "id", "x", "y")
    val out = Impute.pmm(df, Seq("g"), "x", "y", tiebreak = Seq("id"))
      .select("id", "y_imputed").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(4L) == 20.0)
    assert(out(5L) == 60.0)
    // observed rows keep their own y
    assert(out(1L) == 10.0 && out(2L) == 20.0 && out(3L) == 60.0)
  }

  test("equidistant donors resolve to the earlier (prev) donor; edges clamp") {
    val df = Seq[(String, Long, Double, java.lang.Double)](
      ("g", 1L, 1.0, 10.0),
      ("g", 2L, 3.0, 30.0),
      ("g", 3L, 2.0, null), // exactly between donors at x=1 and x=3 → prev (10.0)
      ("g", 4L, 0.0, null), // before all observed → next (10.0)
      ("g", 5L, 9.0, null)  // after all observed → prev (30.0)
    ).toDF("g", "id", "x", "y")
    val out = Impute.pmm(df, Seq("g"), "x", "y", tiebreak = Seq("id"))
      .select("id", "y_imputed").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(3L) == 10.0)
    assert(out(4L) == 10.0)
    assert(out(5L) == 30.0)
  }

  test("a group with no observed rows stays null") {
    val df = Seq[(String, Long, Double, java.lang.Double)](
      ("a", 1L, 1.0, 5.0),
      ("b", 2L, 1.0, null),
      ("b", 3L, 2.0, null)
    ).toDF("g", "id", "x", "y")
    val out = Impute.pmm(df, Seq("g"), "x", "y", tiebreak = Seq("id"))
    assert(out.filter($"g" === "b" && $"y_imputed".isNotNull).count() == 0)
    assert(out.filter($"g" === "a").head().getAs[Double]("y_imputed") == 5.0)
  }
}
