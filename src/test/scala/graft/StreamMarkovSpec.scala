package graft

import graft.streaming.StreamMarkov
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class MkEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                event_type: String)

/** Batch ≡ stream for the journey-transition extractor: micro-batch
  * boundaries mid-journey, conversions closing journeys across
  * batches, post-conversion events ignored, terminals derived at
  * close. */
class StreamMarkovSpec extends SparkSpec {
  import spark.implicits._

  private var t = 0L
  private def ev(u: Long, typ: String) = {
    t += 1
    MkEv(u, new java.sql.Timestamp(1700000000000L + t * 1000), t, typ)
  }

  test("batch ≡ stream: transitions + terminals match the q330 journey counts") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[MkEv]
    val out = StreamMarkov.transitions(in.toDF(), "user_id", "ts",
        "event_id", "event_type")
      .writeStream.format("memory").queryName("smk1")
      .outputMode("update").start()
    // user 1 converts ACROSS a batch boundary; user 2 never converts;
    // user 3 converts then keeps emitting (ignored)
    val b1 = Seq(ev(1, "view"), ev(2, "view"), ev(1, "click"), ev(3, "view"))
    val b2 = Seq(ev(1, "purchase"), ev(2, "click"), ev(3, "purchase"),
      ev(3, "view"), ev(3, "click"))
    val b3 = Seq(ev(2, "signup"), ev(3, "error"))
    try {
      in.addData(b1); out.processAllAvailable()
      in.addData(b2); out.processAllAvailable()
      in.addData(b3); out.processAllAvailable()
    } finally out.stop()
    val log = spark.table("smk1")
    val streamed = StreamMarkov.counts(log)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

    // batch reference: the q330 journey semantics over the full history
    val all = (b1 ++ b2 ++ b3).toDF()
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val o = all.select(col("user_id"),
        when(col("event_type") === "purchase", lit("conv"))
          .otherwise(col("event_type")).as("st"),
        row_number().over(w).as("rn"))
    val fp = o.filter(col("st") === "conv")
      .groupBy(col("user_id")).agg(min(col("rn")).as("prn"))
    val j = o.join(fp, Seq("user_id"), "left")
      .filter(col("prn").isNull || col("rn") <= col("prn"))
    val w2 = W.partitionBy(col("user_id")).orderBy(col("rn"))
    val tr = j.select(
      coalesce(lag(col("st"), 1).over(w2), lit("start")).as("src"),
      col("st").as("dst"))
    val term = j.withColumn("rr", row_number().over(
        W.partitionBy(col("user_id")).orderBy(col("rn").desc)))
      .filter(col("rr") === 1 && col("st") =!= "conv")
      .select(col("st").as("src"), lit("null").as("dst"))
    val batch = tr.unionByName(term).groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

    assert(streamed === batch, "micro-batch boundaries must be invisible")
    // spot-checks of the journey semantics
    assert(streamed(("click", "conv")) === 1L) // user 1 converted
    assert(streamed(("view", "conv")) === 1L)  // user 3 converted
    assert(streamed(("signup", "null")) === 1L) // user 2 open journey ends
    assert(!streamed.keySet.exists(_._1 == "error"),
      "post-conversion events never become transitions")
  }

  test("per-user state is write-once after conversion") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[MkEv]
    val out = StreamMarkov.transitions(in.toDF(), "user_id", "ts",
        "event_id", "event_type")
      .writeStream.format("memory").queryName("smk2")
      .outputMode("update").start()
    try {
      in.addData(Seq(ev(9, "purchase"))); out.processAllAvailable()
      in.addData(Seq(ev(9, "view"), ev(9, "purchase")))
      out.processAllAvailable()
    } finally out.stop()
    val rows = spark.table("smk2").collect()
    assert(rows.length === 1)
    assert(rows.head.getString(2) === "start" &&
      rows.head.getString(3) === "conv")
  }
}
