package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Expectations.RowRule
import graft.streaming.StreamContract

case class ContractRec(id: Long, price: Double, status: String)

/** [[graft.streaming.StreamContract]] — the ingest-path data-contract
  * firewall: per-batch main/quarantine split + audit, exactly-once. */
class StreamContractSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    RowRule("price_pos", col("price") > 0.0),
    RowRule("status_enum", col("status").isin("O", "F")))

  test("gate splits main/quarantine per batch and audits every rule") {
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("contract").toString
    val input = MemoryStream[ContractRec]
    val q = input.toDF().writeStream
      .foreachBatch(StreamContract.gate(rules, root))
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      input.addData(
        ContractRec(1, 10.0, "O"),
        ContractRec(2, -1.0, "O"),   // price fails
        ContractRec(3, 5.0, "X"))    // enum fails
      q.processAllAvailable()
      input.addData(ContractRec(4, 2.0, "F"))
      q.processAllAvailable()

      val main = spark.read.parquet(s"$root/main").as[ContractRec].collect()
      assert(main.map(_.id).sorted.toSeq == Seq(1L, 4L))
      val quar = spark.read.parquet(s"$root/quarantine")
      assert(quar.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
      // quarantine rows carry WHICH rules failed
      val failedOf = quar.select(col("id"), col("failed_rules"))
        .as[(Long, Seq[String])].collect().toMap
      assert(failedOf(2L) == Seq("price_pos"))
      assert(failedOf(3L) == Seq("status_enum"))
      // audit: one row per rule per batch with exact counts
      val audit = spark.read.parquet(s"$root/audit")
        .select(col("batch_id"), col("rule"), col("n_rows"), col("n_bad"))
        .as[(Long, String, Long, Long)].collect().toSet
      assert(audit.contains((0L, "price_pos", 3L, 1L)))
      assert(audit.contains((0L, "status_enum", 3L, 1L)))
      assert(audit.contains((1L, "price_pos", 1L, 0L)))
    } finally q.stop()
  }

  test("a replayed batch is a no-op once committed (exactly-once)") {
    val root = Files.createTempDirectory("contract2").toString
    val batch = Seq(ContractRec(1, 1.0, "O"), ContractRec(2, -1.0, "O")).toDF()
    StreamContract.gate(rules, root)(batch, 7L)
    val before = spark.read.parquet(s"$root/main").collect().toSet
    // replay with DIFFERENT data under the same batchId: committed
    // output must win (the crash-replay contract keys on batchId)
    StreamContract.gate(rules, root)(
      Seq(ContractRec(99, 1.0, "O")).toDF(), 7L)
    val after = spark.read.parquet(s"$root/main").collect().toSet
    assert(before == after)
    assert(spark.read.parquet(s"$root/audit").count() == rules.size)
  }
}
