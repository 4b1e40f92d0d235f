package graft

import graft.streaming.ValidateStreaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class TripRow(
    submission_id: Long, landing_date: java.sql.Date,
    submission_date: java.sql.Date, duration_hrs: Double,
    station_code: String, habitat_code: Option[Long],
    fisher_child: Double, fisher_man: Double, fisher_woman: Double,
    mesh_size: String, mesh_other: String, n_gleaners: Double, fuel: Double)

/** Batch ≡ stream for the trip-local validators: the SAME column-
  * expression plan validates a bounded frame and an unbounded stream
  * (stream-static broadcast joins; bounds as the static side). */
class ValidateStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  // ln(1+x) bounds: med = ln(1+2), mad tight -> values far from 2 flag
  private def bounds = {
    val m = math.log(3.0)
    Seq("fisher_child", "fisher_man", "fisher_woman", "n_gleaners", "fuel")
      .foldLeft(Seq((1)).toDF("__one")) { (df, n) =>
        df.withColumn(s"__med_$n", lit(m))
          .withColumn(s"__mad_$n", lit(0.2))
          .withColumn(s"__ok_$n", lit(1))
      }.drop("__one")
  }

  private def sites = Seq(("1", "Dili", 1L))
    .toDF("__scode", "station_name", "reporting_region")
  private def habitatDim = Seq(1L, 2L).toDF("habitat_code")

  private val rows = Seq(
    TripRow(1L, d("2024-03-01"), d("2024-03-02"), 5.0, "1", Some(1L), 2, 2, 2, "1", "30", 2, 2),
    TripRow(2L, d("2024-03-01"), d("2024-03-02"), 120.0, "1", Some(1L), 2, 2, 2, "1", "30", 2, 2), // 5
    TripRow(3L, d("2024-03-05"), d("2024-03-02"), 5.0, "1", Some(1L), 2, 2, 2, "1", "30", 2, 2),   // 4
    TripRow(4L, d("2024-03-01"), d("2024-03-02"), 5.0, "9", Some(1L), 2, 2, 2, "1", "30", 2, 2),   // 16
    TripRow(5L, d("2024-03-01"), d("2024-03-02"), 5.0, "1", Some(7L), 2, 2, 2, "1", "30", 2, 2),   // 19
    TripRow(6L, d("2024-03-01"), d("2024-03-02"), 5.0, "1", Some(1L), 90, 2, 2, "1", "30", 2, 2),  // 18
    TripRow(7L, d("2024-03-01"), d("2024-03-02"), 5.0, "1", Some(1L), 2, 2, 2, "40", "30", 2, 2),  // 20
    TripRow(8L, d("2024-03-01"), d("2024-03-02"), 5.0, "1", Some(1L), 2, 2, 2, "1", "30", 95, 2),  // 21
    TripRow(9L, d("2024-03-01"), d("2024-03-02"), 5.0, "1", Some(1L), 2, 2, 2, "1", "30", 2, -3))  // 23

  private val expected = Map(
    1L -> "0", 2L -> "5", 3L -> "4", 4L -> "16", 5L -> "19",
    6L -> "18", 7L -> "20", 8L -> "21", 9L -> "23")

  test("batch: each trip-local validator fires its code; fields clean per validator") {
    val out = ValidateStreaming.validate(rows.toDF(), bounds, sites, habitatDim)
    val alerts = out.select($"submission_id", $"alert").as[(Long, String)].collect().toMap
    assert(alerts == expected)
    val r2 = out.filter($"submission_id" === 2L).head()
    assert(r2.isNullAt(r2.fieldIndex("trip_length")))
    val r6 = out.filter($"submission_id" === 6L).head()
    assert(r6.isNullAt(r6.fieldIndex("fisher_man"))) // all fisher fields null on 18
    val r9 = out.filter($"submission_id" === 9L).head()
    assert(r9.isNullAt(r9.fieldIndex("fuel")))
  }

  test("stream: the same plan over a stream yields identical rows") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[TripRow]
    val q = ValidateStreaming.validate(src.toDF(), bounds, sites, habitatDim)
      .writeStream.format("memory").queryName("validated_stream")
      .outputMode("append").start()
    try {
      src.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("validated_stream")
        .select($"submission_id", $"alert").as[(Long, String)].collect().toMap
      assert(streamed == expected)
    } finally q.stop()
  }
}
