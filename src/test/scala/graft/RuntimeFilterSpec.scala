package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection — the engine-level mechanism that
  * prunes a 100 TB fact scan against a selective dimension filter when
  * the dim is too big to broadcast: Spark builds a bloom filter from
  * the filtered creation side and pushes `might_contain` into the
  * fact side BEFORE the shuffle, so most fact rows never shuffle.
  *
  * Locally every table broadcasts and the application-side scan is far
  * under the 10 GB default threshold, so the rule never fires in the
  * oracle suite — this spec simulates the scale conditions (broadcast
  * off, thresholds sized to the fixture) and asserts the mechanism the
  * cluster relies on actually injects under [[graft.core.GraftSession]]'s
  * configuration, and that it changes no results.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dim filter injects a bloom filter into the fact side") {
    val d = sf
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val ord = spark.read.parquet(s"$d/orders.parquet")
      .filter(col("o_totalprice") > 400000)
    val join = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    val expected = join.count()
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val j2 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val opt = j2.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom"), s"no runtime bloom filter injected:\n$opt")
      assert(j2.count() == expected, "runtime filter must not change results")
    }
  }

  test("the engine session ships with the runtime bloom filter enabled") {
    assert(spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true")
  }
}
