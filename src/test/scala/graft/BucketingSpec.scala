package graft

import graft.core.{Bucketing, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without any Exchange") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Bucketing.writeBucketed(li, "b_lineitem", Seq("l_orderkey"), 4)
    Bucketing.writeBucketed(o, "b_orders", Seq("l_orderkey"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), Seq("l_orderkey"))
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity").as("q"), sum($"o_totalprice").as("t"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // correctness: identical to the unbucketed join
      val direct = li.join(o, Seq("l_orderkey"))
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity").as("q"), sum($"o_totalprice").as("t"))
      assert(joined.exceptAll(direct).isEmpty && direct.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
