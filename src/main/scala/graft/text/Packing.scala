package graft.text

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

/** Sequence packing for pretraining batches (builder mandate: the
  * operations a large-scale training-data pipeline needs): documents
  * are laid out into fixed token-capacity bins so a downstream batcher
  * reads whole bins. Two disciplines:
  *
  *  - [[pack]]: concat-and-chunk (contiguous fill). Tokens stream into
  *    bins with no gaps; a document may straddle a bin boundary and is
  *    assigned to the bin it STARTS in (`spans_bins` flags stragglers).
  *  - [[packFirstFit]]: no-straddle. A document that doesn't fit in the
  *    open bin closes it and opens the next; bins never exceed capacity
  *    (oversize documents get a bin of their own, flagged `oversize`).
  *
  * Global first-fit packing is inherently sequential; the scalable
  * discipline is SHARD-LOCAL: documents hash into shards, each shard
  * packs independently with a running token total (one window — or one
  * sequential scan — per shard, no global sort, no driver loop).
  * Utilization loss vs global packing is bounded by one partial bin per
  * shard — negligible at any shard count worth running. All arithmetic
  * is integer, so bin assignments are bit-reproducible at any
  * parallelism.
  */
object Packing {

  /** Assign each document a (shard, bin, offset) under contiguous fill:
    * shard = `hash mod nShards` (md5-derived — engine-portable), bin =
    * the fixed-capacity bin the document STARTS in when tokens stream
    * gaplessly in `idCol` order, offset = tokens already in that bin
    * before it. A document whose tokens cross the bin boundary is still
    * attributed to its start bin — `spans_bins` marks it (callers chunk
    * or drop); a document longer than `capacity` therefore spans one or
    * more whole bins. Use [[packFirstFit]] when documents must not
    * straddle. */
  def pack(docs: DataFrame, idCol: String, tokensCol: String,
           capacity: Long, nShards: Int): DataFrame = {
    val shard = (conv(substring(md5(col(idCol).cast("string")), 1, 7), 16, 10)
      .cast("long") % nShards).as("shard")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(tokensCol).cast("long").as("__t"), shard)
      .withColumn("__cum", sum(col("__t")).over(w))
      .select(
        col(idCol),
        col("shard"),
        ((col("__cum") - col("__t")) / capacity).cast("long").as("bin"),
        ((col("__cum") - col("__t")) % capacity).cast("long").as("offset"),
        col("__t").as("n_tokens"),
        (((col("__cum") - col("__t")) % capacity) + col("__t") > capacity)
          .as("spans_bins"))
  }

  /** No-straddle packing: same sharding and `idCol` order as [[pack]],
    * but a document that would cross the open bin's boundary closes the
    * bin (leaving slack) and starts the next one, so `offset +
    * n_tokens <= capacity` for every document except oversize ones
    * (`n_tokens > capacity`), which sit alone in their bin, flagged
    * `oversize`.
    *
    * The fill state (bin, running tokens) is a non-associative fold, so
    * this is a per-shard sequential scan rather than a window: shards
    * hash-partition, rows sort (shard, id) within partitions, and one
    * pass assigns bins. Work per task is one shard's documents — the
    * same shard-local scalability contract as [[pack]]. */
  def packFirstFit(docs: DataFrame, idCol: String, tokensCol: String,
                   capacity: Long, nShards: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val shard = (conv(substring(md5(col(idCol).cast("string")), 1, 7), 16, 10)
      .cast("long") % nShards).as("shard")
    val prepared = docs
      .select(col(idCol), col(tokensCol).cast("long").as("__t"), shard)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
    val outSchema = StructType(Seq(
      prepared.schema.fields(0),
      StructField("shard", LongType, nullable = false),
      StructField("bin", LongType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("oversize", BooleanType, nullable = false)))
    prepared.mapPartitions { it =>
      // Shards are contiguous after the sort; reset state on shard change.
      var curShard = Long.MinValue
      var bin = 0L
      var fill = 0L
      it.map { r =>
        val s = r.getLong(2)
        val t = r.getLong(1)
        if (s != curShard) { curShard = s; bin = 0L; fill = 0L }
        if (fill > 0L && fill + t > capacity) { bin += 1L; fill = 0L }
        val offset = fill
        fill += t
        Row(r.get(0), s, bin, offset, t, t > capacity)
      }
    }(Encoders.row(outSchema))
  }

  /** Per-bin census: document count, token fill, utilization. Documents
    * count toward the bin they are assigned to — under [[pack]] that is
    * the START bin, so a straddling document's tokens are all
    * attributed there: `fill_ratio` is "tokens starting in bin /
    * capacity" and can exceed 1.0 (with later bins correspondingly
    * undercounted). Under [[packFirstFit]] assignment is containment,
    * so `fill_ratio <= 1.0` except for oversize singleton bins. */
  def binStats(packed: DataFrame, capacity: Long): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (sum(col("n_tokens")).cast("double") / capacity).as("fill_ratio"))
}
