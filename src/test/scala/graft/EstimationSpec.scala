package graft

import graft.pipeline.Estimation
import org.apache.spark.sql.functions._

/** Estimation composition unit surface (`R/estimate-catch.R:487-613`). */
class EstimationSpec extends SparkSpec {
  import spark.implicits._

  test("taxa redistribution: shares applied to the national total sum back to it; null propagates") {
    val agg = Seq(
      ("2024-1", "2024-01-01", 1000.0),
      ("2024-2", "2024-02-01", 500.0)
    ).toDF("period", "landing_period", "catch")
      .withColumn("landing_period", to_date($"landing_period"))
    val taxa = Seq(
      ("2024-1", "2024-01-01", "TUN", 30.0),
      ("2024-1", "2024-01-01", "SAR", 10.0),
      ("2024-2", "2024-02-01", "TUN", 5.0),
      ("2024-2", "2024-02-01", "SAR", Double.NaN) // null below
    ).toDF("period", "landing_period", "grouped_taxa", "catch")
      .withColumn("landing_period", to_date($"landing_period"))
      .withColumn("catch", when(isnan($"catch"), lit(null)).otherwise($"catch"))
    val out = Estimation.taxaProportion(agg, taxa).cache()
    val jan = out.filter(month($"landing_period") === 1)
      .select($"grouped_taxa", $"catch").as[(String, Double)].collect().toMap
    assert(math.abs(jan("TUN") - 750.0) < 1e-9) // 30/40 of 1000
    assert(math.abs(jan("SAR") - 250.0) < 1e-9)
    assert(math.abs(jan.values.sum - 1000.0) < 1e-9) // shares sum to the national estimate
    // Feb: a null taxa catch poisons the denominator (R's bare sum) -> null everywhere
    val feb = out.filter(month($"landing_period") === 2)
      .select($"catch").collect().map(_.isNullAt(0))
    assert(feb.length == 2 && feb.forall(identity))
  }

  test("national aggregated rollup: means, na.rm sums, median price across municipalities") {
    val m = Seq(
      ("2024-1", 1, "2024-01-01", "Dili", 10.0, Some(100.0), 2.0),
      ("2024-1", 1, "2024-01-01", "Baucau", 20.0, None, 4.0),
      ("2024-1", 1, "2024-01-01", "Lautem", 30.0, Some(50.0), 9.0)
    ).toDF("period", "month", "landing_period", "municipality",
        "landing_catch_price", "catch", "price_kg")
      .withColumn("landing_period", to_date($"landing_period"))
      .withColumn("n_landings_per_boat", lit(1.0))
      .withColumn("landing_catch", lit(2.0))
      .withColumn("catch_price", lit(5.0))
    val r = Estimation.nationalAggregated(m).head()
    assert(r.getAs[Double]("landing_catch_price") == 20.0)
    assert(r.getAs[Double]("catch") == 150.0) // na.rm: null skipped
    assert(r.getAs[Double]("price_kg") == 4.0) // median
  }

  test("fillMissingRegions: modal municipality per imei backfills nulls") {
    val trips = Seq(
      ("A", "Dili"), ("A", "Dili"), ("A", "Baucau"),
      ("A", null.asInstanceOf[String]),
      ("B", null.asInstanceOf[String])
    ).toDF("tracker_imei", "municipality")
    val out = Estimation.fillMissingRegions(trips)
    assert(out.filter($"tracker_imei" === "A" && $"municipality".isNull).count() == 0)
    assert(out.filter($"tracker_imei" === "A" && $"municipality" === "Dili").count() == 3)
    // no observed municipality for B -> stays null
    assert(out.filter($"tracker_imei" === "B").head().isNullAt(1))
  }
}
