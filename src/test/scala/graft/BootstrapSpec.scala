package graft

import org.apache.spark.sql.functions._
import graft.stats.Bootstrap

/** [[graft.stats.Bootstrap]] — Poisson-bootstrap CIs (q169). */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("poissonWeight draws have Poisson(1) mass and are replayable") {
    val keys = (1 to 20000).map(i => s"k$i").toDF("k")
    val w = keys.select(Bootstrap.poissonWeight(col("k"), "s1").as("w"))
      .collect().map(_.getLong(0))
    val n = w.length.toDouble
    assert(math.abs(w.count(_ == 0) / n - math.exp(-1.0)) < 0.01) // P(0)=1/e
    assert(math.abs(w.sum / n - 1.0) < 0.02)                      // mean 1
    assert(w.forall(x => x >= 0 && x <= 6))
    val w2 = keys.select(Bootstrap.poissonWeight(col("k"), "s1").as("w"))
      .collect().map(_.getLong(0))
    assert(w.sameElements(w2))
  }

  test("ciMean brackets the point estimate and has sane width") {
    // two groups with different dispersion: same mean, CI wider for b
    val rows =
      (1 to 400).map(i => ("a", i.toLong, 100L + (i % 3))) ++
      (1 to 400).map(i => ("b", 1000L + i, if (i % 2 == 0) 10L else 190L))
    val df = rows.toDF("lang", "doc_id", "n_chars")
    val out = Bootstrap.ciMean(df, "lang", "doc_id", "n_chars", "t")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    for ((_, (mean, lo, hi, nr)) <- out) {
      assert(nr == 32L)
      assert(lo <= mean && mean <= hi)
    }
    val widthA = out("a")._3 - out("a")._2
    val widthB = out("b")._3 - out("b")._2
    assert(widthB > widthA * 3) // dispersion shows up in the interval
  }

  test("ciMean is invariant to input partitioning") {
    val df = (1 to 300).map(i => ("g", i.toLong, (i % 50).toLong))
      .toDF("lang", "doc_id", "n_chars")
    val a = Bootstrap.ciMean(df, "lang", "doc_id", "n_chars", "p")
      .collect()(0)
    val b = Bootstrap.ciMean(df.repartition(7), "lang", "doc_id", "n_chars", "p")
      .collect()(0)
    assert(a.getDouble(2) == b.getDouble(2) && a.getDouble(3) == b.getDouble(3))
  }
}
