package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.BloomBits

/** Sharded Bloom-filter stream dedup — CONSTANT state per shard, the
  * Dolma-scale answer to [[StreamDedup.exactOnce]]'s ever-growing key
  * store: the key space hash-partitions into `shards` groups, each
  * group owns a fixed `mPerShard`-bit filter in the state store, and a
  * key is "possibly seen" iff all its bits are set in ITS OWN shard's
  * filter (membership never crosses shards, so no cross-group
  * synchronization exists). Total state = shards × mPerShard / 8
  * bytes, forever, regardless of how many keys stream past — the
  * trade is a measurable false-positive rate (keys wrongly flagged
  * seen), never false negatives.
  *
  * Bit positions derive from [[BloomBits.positionsJvm]] — the same
  * md5 double hashing as the SQL/batch filter (q154), so a batch
  * replay of the same ordered input reproduces verdicts exactly
  * (StreamBloomSpec pins stream ≡ replayed-batch parity and the
  * audited FP split).
  *
  * Rows within a (micro-batch, shard) process in (tsCol, key) order —
  * Spark does not define iterator order inside a group, and without
  * the sort the first-occurrence verdict of two same-batch duplicates
  * would be nondeterministic.
  */
object StreamBloom {

  case class KeyTs(shard: Int, key: String, ts: Long)
  case class Verdict(key: String, ts: Long, maybe_seen: Boolean)

  /** Annotate a stream (or batch frame) of keys with `maybe_seen`.
    * Emits one row per input row, Append mode. */
  def dedup(df: DataFrame, keyCol: String, tsCol: String,
            shards: Int, mPerShard: Int, k: Int, tag: String = ""): DataFrame = {
    require(mPerShard % 64 == 0 && shards > 0 && k > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(keyCol).cast("string").as("key"), col(tsCol).cast("long").as("ts"))
      .withColumn("shard",
        (conv(substring(md5(concat(lit(s"bs-$tag"), col("key"))), 1, 7), 16, 10)
          .cast("long") % shards).cast("int"))
      .as[KeyTs]
    keyed.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[KeyTs], state: GroupState[Array[Long]]) =>
          val bits = state.getOption.getOrElse(new Array[Long](mPerShard / 64))
          val out = rows.toSeq.sortBy(r => (r.ts, r.key)).map { r =>
            val pos = BloomBits.positionsJvm(r.key, k, mPerShard, tag)
            val seen = pos.forall(p => (bits((p >> 6).toInt) & (1L << (p & 63))) != 0)
            pos.foreach(p => bits((p >> 6).toInt) |= (1L << (p & 63)))
            Verdict(r.key, r.ts, seen)
          }
          state.update(bits)
          out.iterator
      }
      .toDF()
  }
}
