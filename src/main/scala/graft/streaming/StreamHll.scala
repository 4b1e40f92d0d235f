package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.HllSketch

/** Sharded streaming HyperLogLog — the running COUNT DISTINCT census
  * over an unbounded stream in CONSTANT state (the [[StreamBloom]]
  * companion for cardinality instead of membership): keys
  * hash-partition into `shards` groups, each group owns a 2^p-byte
  * register vector in the state store, and after every micro-batch
  * each shard emits its updated registers.
  *
  * The shard registers are PARTIAL SKETCHES of one global sketch:
  * every shard buckets by the same [[HllSketch.hash60Jvm]], so an
  * elementwise max across shard rows reconstructs exactly the
  * registers a single batch `hll_registers` pass over the whole
  * history would produce (StreamHllSpec pins this identity). Max-merge
  * is associative, commutative AND idempotent — a replayed micro-batch
  * is a register no-op, which makes the emitted rows safe under
  * at-least-once delivery with no dedup bookkeeping at all: the
  * strongest exactly-once story any operator in the suite has, for
  * free, by sketch algebra.
  *
  * Total state = shards × 2^p bytes, forever. Emission is Update-mode
  * (one row per touched shard per batch): (shard, batch_rows,
  * registers).
  */
object StreamHll {

  case class KeyIn(shard: Int, key: String)
  case class ShardRegs(shard: Int, batch_rows: Long, registers: Seq[Int])

  def registers(df: DataFrame, keyCol: String,
                shards: Int, p: Int, tag: String = ""): DataFrame = {
    // p >= 9 matches HllRegistersAgg: the downstream estimate fold
    // needs max rho = 61-p <= 52 for the int64 2^{52-M_j} sum
    require(shards > 0 && p >= 9 && p <= 16)
    val m = 1 << p
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(keyCol).cast("string").as("key"))
      .withColumn("shard",
        (conv(substring(md5(concat(lit(s"shll-$tag"), col("key"))), 1, 7), 16, 10)
          .cast("long") % shards).cast("int"))
      .as[KeyIn]
    keyed.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[KeyIn], state: GroupState[Array[Byte]]) =>
          val regs = state.getOption.getOrElse(new Array[Byte](m))
          var n = 0L
          rows.foreach { r =>
            HllSketch.updateRegister(regs, HllSketch.hash60Jvm(r.key, tag), p)
            n += 1
          }
          state.update(regs)
          Iterator(ShardRegs(shard, n, regs.map(_.toInt).toSeq))
      }
      .toDF()
  }

  /** Merge emitted shard rows (latest per shard) back into the global
    * estimate — plain built-ins over an at-most-`shards`-row frame. */
  def mergedEstimate(shardRows: DataFrame, p: Int): DataFrame = {
    // each emitted row carries the full dense 2^p array, so the
    // per-bucket max covers every bucket — no missing-bucket correction
    val merged = shardRows
      .select(posexplode(col("registers")).as(Seq("bucket", "reg")))
      .groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
      .agg(
        sum(when(col("reg") === 0, 1L).otherwise(0L)).as("zeros"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - reg)")).as("sumexp_s52"))
    merged.select(col("zeros"), col("sumexp_s52"),
      HllSketch.estimateCol(col("zeros"), col("sumexp_s52"), p).as("estimate"))
  }
}
