package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.{QSketchBuffer, QSketchOps}

/** Sharded streaming quantile sketch — the running percentile monitor
  * over an unbounded stream in bounded state (the [[StreamHll]]
  * companion for QUANTILES instead of cardinality): rows hash-shard by
  * a key column, each shard owns one serialized KLL compactor in the
  * state store (O(capacity · log(n/capacity)) bytes), and after every
  * micro-batch each touched shard emits its updated state.
  *
  * Shard states are PARTIAL SKETCHES of one global sketch: merging the
  * latest emission per shard (`kll_merge` — the q260 algebra) yields a
  * sketch whose estimate is the exact R-type-7 quantile while no
  * compaction has fired (StreamKllSpec pins stream ≡ batch exact in
  * that regime) and carries the standard KLL rank bound beyond it.
  *
  * Honest delivery contract (UNLIKE StreamHll): insertion is NOT
  * idempotent — max-merge absorbs replays, compactor insertion double
  * counts them. At-least-once sources therefore need the upstream
  * dedup the suite already provides ([[StreamDedup]] /
  * [[IdempotentSink]]); this operator is exactly-once w.r.t. its
  * INPUT rows, per-batch transactional in the state store like every
  * flatMapGroupsWithState arm.
  */
object StreamKll {

  case class ValIn(shard: Int, v: Double)
  case class ShardSketch(shard: Int, batch_rows: Long, state: Array[Byte])

  /** Shard the stream's `valueCol` into `shards` KLL compactors of the
    * given capacity; Update-mode emission of (shard, batch_rows,
    * state) per touched shard per micro-batch. */
  def sketch(df: DataFrame, valueCol: String,
             shards: Int, capacity: Int, tag: String = ""): DataFrame = {
    require(shards > 0 && capacity >= 4)
    val cap = if (capacity % 2 == 0) capacity else capacity + 1 // quantile_sketch's even-cap rule
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("shard",
        (conv(substring(md5(concat(lit(s"skll-$tag"), col("v").cast("string"))), 1, 7), 16, 10)
          .cast("long") % shards).cast("int"))
      .select(col("shard"), col("v")).as[ValIn]
    keyed.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[ValIn], state: GroupState[Array[Byte]]) =>
          val buf = state.getOption.map(QSketchOps.deserialize)
            .getOrElse(new QSketchBuffer())
          var n = 0L
          rows.foreach { r => QSketchOps.insert(buf, r.v, cap); n += 1 }
          val bytes = QSketchOps.serialize(buf)
          state.update(bytes)
          Iterator(ShardSketch(shard, n, bytes))
      }
      .toDF()
  }

  /** Merge emitted shard rows (latest per shard) into global quantile
    * estimates — the q260 `kll_merge`/`kll_value` algebra over an
    * at-most-`shards`-row frame. */
  def mergedQuantiles(shardRows: DataFrame, capacity: Int,
                      ps: Seq[Double]): DataFrame = {
    graft.functions.KllAlgebra.register(shardRows.sparkSession)
    val cap = if (capacity % 2 == 0) capacity else capacity + 1
    val merged = shardRows.agg(expr(s"kll_merge(state, $cap)").as("__st"))
    val cols = col("n") +: ps.map(p =>
      expr(s"kll_value(__st, $p)").as(s"p${(p * 100).round}"))
    merged.withColumn("n", expr("kll_n(__st)")).select(cols: _*)
  }
}
