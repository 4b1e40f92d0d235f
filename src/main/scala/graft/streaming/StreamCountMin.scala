package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sharded Count-Min occurrence capping over a stream — the
  * frequency-aware generalization of [[StreamBloom]]'s membership
  * dedup: instead of "drop if possibly seen", keep each key's first
  * `cap` occurrences (soft dedup — the recipe for capping boilerplate
  * or template documents at N copies instead of one). State per shard
  * is a FIXED depth×width int64 counter matrix, forever, regardless of
  * key cardinality; the Count-Min estimate never undercounts, so a key
  * is never kept MORE than `cap` times — collisions can only retire a
  * key early (the conservative direction, same trade as the Bloom
  * filter's false positives, and auditable the same way).
  *
  * Cell positions derive from the same md5 discipline as the batch
  * [[graft.functions.CountMin]] aggregate (first 7 hex chars of
  * md5("<d>:<key>") mod width), so a batch replay of the same ordered
  * input reproduces every verdict exactly — StreamCountMinSpec pins
  * stream ≡ replayed-batch parity and cross-batch accumulation.
  *
  * Rows within a (micro-batch, shard) process in (tsCol, key) order —
  * Spark does not define iterator order inside a group, and the
  * keep-first-cap verdict of same-batch duplicates must not depend on
  * it.
  */
object StreamCountMin {

  case class KeyTs(shard: Int, key: String, ts: Long)
  case class Verdict(key: String, ts: Long, occ_before: Long, kept: Boolean)

  private def cell(d: Int, s: String, width: Int): Int = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d:$s".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((dig(0) & 0xffL) << 20) | ((dig(1) & 0xffL) << 12) |
      ((dig(2) & 0xffL) << 4) | ((dig(3) & 0xf0L) >> 4)
    (v % width).toInt
  }

  /** Annotate a stream (or batch frame) of keys with the Count-Min
    * occurrence estimate BEFORE the row and the keep verdict
    * (`occ_before < cap`). Emits one row per input, Append mode. */
  def capOccurrences(df: DataFrame, keyCol: String, tsCol: String,
                     shards: Int, depth: Int, width: Int, cap: Long,
                     tag: String = ""): DataFrame = {
    require(shards > 0 && depth > 0 && width > 0 && cap > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(keyCol).cast("string").as("key"), col(tsCol).cast("long").as("ts"))
      .withColumn("shard",
        (conv(substring(md5(concat(lit(s"cm-$tag"), col("key"))), 1, 7), 16, 10)
          .cast("long") % shards).cast("int"))
      .as[KeyTs]
    keyed.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[KeyTs], state: GroupState[Array[Long]]) =>
          val counters = state.getOption.getOrElse(new Array[Long](depth * width))
          val out = rows.toSeq.sortBy(r => (r.ts, r.key)).map { r =>
            val cells = Array.tabulate(depth)(d => d * width + cell(d, r.key, width))
            val est = cells.map(counters(_)).min
            val kept = est < cap
            // only KEPT rows count: a retired key stops polluting its
            // cells, so collisions with a capped hot key stay bounded
            if (kept) cells.foreach(c => counters(c) += 1L)
            Verdict(r.key, r.ts, est, kept)
          }
          state.update(counters)
          out.iterator
      }
      .toDF()
  }
}
