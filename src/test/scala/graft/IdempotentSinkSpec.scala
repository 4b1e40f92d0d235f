package graft

import graft.streaming.IdempotentSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._

  test("re-delivered batch ids are no-ops; reader sees one hive table") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val write = IdempotentSink.parquet(root)
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    write(b0, 0L)
    write(b1, 1L)
    write(Seq((9L, "dup")).toDF("id", "v"), 0L) // crash re-delivery of batch 0
    val all = spark.read.parquet(root)
    assert(all.count() == 3)
    assert(all.filter($"id" === 9L).count() == 0, "re-delivered batch must not overwrite")
    assert(all.select("batch").distinct().count() == 2)
  }

  test("drives a real streaming query through foreachBatch") {
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-sink2").toString
    val input = MemoryStream[Long]
    val q = input.toDF().writeStream
      .foreachBatch(IdempotentSink.parquet(root))
      .start()
    try {
      input.addData(1L, 2L)
      q.processAllAvailable()
      input.addData(3L)
      q.processAllAvailable()
      assert(spark.read.parquet(root).count() == 3)
    } finally q.stop()
  }
}
