package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys. At 100 TB a handful of hot
  * keys (one municipality, one device, one stop-shingle) can pin a
  * single reducer; salting splits each key across `numSalts` partial
  * groups and recombines — two shuffles, both balanced, instead of one
  * skewed one.
  *
  * Only algebraic aggregates decompose this way (sum/count/min/max —
  * partial then re-aggregate). For skewed *joins*, prefer AQE's
  * skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) before hand-salting.
  */
object Salting {

  /** Salted sum/count/min/max aggregation. `aggs` maps output column →
    * ("sum"|"count"|"min"|"max", input column). Results are identical
    * to a direct groupBy (decimal-route double sums yourself if you
    * need bit-stability — salting changes addition order for plain
    * doubles). */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
                      aggs: Map[String, (String, Column)],
                      numSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)))
    val partialExprs = aggs.map { case (out, (fn, c)) =>
      (fn match {
        case "sum"   => sum(c)
        case "count" => count(c)
        case "min"   => min(c)
        case "max"   => max(c)
        case other   => sys.error(s"non-algebraic aggregate: $other")
      }).as(s"__p_$out")
    }.toSeq
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
    val finalExprs = aggs.map { case (out, (fn, _)) =>
      (fn match {
        case "sum"   => sum(col(s"__p_$out"))
        case "count" => sum(col(s"__p_$out")) // counts re-combine by summing
        case "min"   => min(col(s"__p_$out"))
        case "max"   => max(col(s"__p_$out"))
      }).as(out)
    }.toSeq
    partial.groupBy(keys.map(col): _*)
      .agg(finalExprs.head, finalExprs.tail: _*)
  }
}
