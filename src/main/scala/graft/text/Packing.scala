package graft.text

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
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
  * shard — negligible at any shard count worth running. All bin/offset
  * arithmetic is integer (the cumulative sum, the floor-div `div`, and
  * `%` all stay in int64), so assignments are bit-reproducible at any
  * parallelism.
  *
  * Input contract (both disciplines): the token-count column must be a
  * non-negative integer per document. A null, negative, or non-numeric
  * (string that casts to null) count raises a task error naming the
  * offending document — silently coalescing to 0 would fake token
  * conservation, and a null inside the running sum would corrupt every
  * later offset in the shard.
  */
object Packing {

  /** Token counts cast to long with the fail-fast contract above. The
    * guard lives inside the materialized column, so it cannot be pruned
    * away from the plan. */
  private def checkedTokens(idCol: String, tokensCol: String): Column = {
    val t = col(tokensCol).cast("long")
    when(t.isNull || t < 0,
      raise_error(concat(
        lit(s"Packing: '$tokensCol' must be a non-negative integer, got '"),
        coalesce(col(tokensCol).cast("string"), lit("null")),
        lit(s"' for $idCol="), col(idCol).cast("string"))).cast("long"))
      .otherwise(t)
  }

  private def shardExpr(idCol: String, nShards: Int): Column =
    (conv(substring(md5(col(idCol).cast("string")), 1, 7), 16, 10)
      .cast("long") % nShards).as("shard")

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
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), checkedTokens(idCol, tokensCol).as("__t"),
        shardExpr(idCol, nShards))
      .withColumn("__cum", sum(col("__t")).over(w))
      .withColumn("__prev", col("__cum") - col("__t"))
      .select(
        col(idCol),
        col("shard"),
        // int64 floor-div (`div`), NOT `/`: Divide is double division
        // and loses exactness past 2^53 cumulative tokens per shard
        expr(s"__prev div CAST($capacity AS BIGINT)").as("bin"),
        (col("__prev") % capacity).as("offset"),
        col("__t").as("n_tokens"),
        ((col("__prev") % capacity) + col("__t") > capacity)
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
    * range-partition (one shard per task up to `nShards` distinct
    * partitions — hash-partitioning nShards keys into nShards buckets
    * leaves ~1/e of the tasks empty under collisions; range boundaries
    * on the shard value alone never split a shard, because rows with
    * equal keys always land on the same side of a boundary), rows sort
    * (shard, id) within partitions, and one pass assigns bins. Bin
    * assignment depends only on the per-shard (id-sorted) sequence, so
    * it is identical under any input partitioning. Work per task is one
    * shard's documents — the same shard-local scalability contract as
    * [[pack]]. */
  def packFirstFit(docs: DataFrame, idCol: String, tokensCol: String,
                   capacity: Long, nShards: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val prepared = docs
      .select(col(idCol), checkedTokens(idCol, tokensCol).as("__t"),
        shardExpr(idCol, nShards))
      .repartitionByRange(nShards, col("shard"))
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
        val t = r.getLong(1) // non-null by the checkedTokens guard
        if (s != curShard) { curShard = s; bin = 0L; fill = 0L }
        if (fill > 0L && fill + t > capacity) { bin += 1L; fill = 0L }
        val offset = fill
        fill += t
        Row(r.get(0), s, bin, offset, t, t > capacity)
      }
    }(Encoders.row(outSchema))
  }

  /** Materialize [[pack]] assignments into per-bin SEGMENTS — the
    * actual concat-and-chunk read layout: each document yields one row
    * per bin it touches, with the half-open within-document token range
    * `[tok_start, tok_end)` it contributes there and its offset inside
    * the bin. Straddling documents split into one full-bin segment per
    * crossed boundary; everything else yields a single segment. A
    * 0-token document keeps one empty segment (row conservation).
    *
    * Pure per-row arithmetic + one bounded explode (a document touches
    * `1 + n_tokens div capacity` bins at most) — no shuffle, no state:
    * the contiguous-fill invariant (global start = bin·capacity +
    * offset) makes every segment computable from the row alone. */
  def chunks(packed: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val cap = lit(capacity)
    val gs = col("bin") * cap + col("offset")
    val lastTok = when(col("n_tokens") > 0, gs + col("n_tokens") - 1).otherwise(gs)
    val idName = packed.columns.head
    packed
      .withColumn("__gs", gs)
      .withColumn("__last", lastTok)
      .withColumn("__b", explode(sequence(
        expr(s"__gs div CAST($capacity AS BIGINT)"),
        expr(s"__last div CAST($capacity AS BIGINT)"))))
      .select(col(idName), col("shard"),
        col("__b").as("bin"),
        (greatest(col("__b") * cap, col("__gs")) - col("__gs")).as("tok_start"),
        (least((col("__b") + 1) * cap, col("__gs") + col("n_tokens")) - col("__gs"))
          .as("tok_end"),
        (greatest(col("__b") * cap, col("__gs")) - col("__b") * cap).as("offset"))
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

  /** Length-bucketed batch planning — padded batching's answer to
    * packing: when documents must stay whole and batches are padded to
    * their longest member (inference serving, non-packed finetuning),
    * grouping similar lengths together is what controls the padding
    * bill. Assigns each document a (shard, batch, and the batch under
    * BOTH orders): `sorted_batch` groups by length rank within the
    * shard (tokens asc, id tie-break), `arrival_batch` groups by md5
    * arrival rank — the unsorted baseline. Padding for a batch is
    * `batchSize·max(tokens) − Σtokens` (integer); the census the q121
    * gate aggregates quantifies exactly what length-sorting saves.
    * Same md5 sharding and fail-fast token contract as [[pack]]; two
    * shard-local windows, no global sort. */
  def lengthBatches(docs: DataFrame, idCol: String, tokensCol: String,
                    batchSize: Int, nShards: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val bySorted = Window.partitionBy(col("shard"))
      .orderBy(col("n_tokens").asc, col(idCol).asc)
    val byArrival = Window.partitionBy(col("shard"))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    docs.select(col(idCol), checkedTokens(idCol, tokensCol).as("n_tokens"),
        shardExpr(idCol, nShards))
      .withColumn("__rs", row_number().over(bySorted).cast("long"))
      .withColumn("__ra", row_number().over(byArrival).cast("long"))
      .withColumn("sorted_batch", expr(s"(__rs - 1) div $batchSize"))
      .withColumn("arrival_batch", expr(s"(__ra - 1) div $batchSize"))
      .drop("__rs", "__ra")
  }

  /** Padding bill of a batch assignment from [[lengthBatches]] output:
    * per shard, the padded-token total `Σ_batches (n·max − Σtokens)`
    * under both orders — `sorted_padding` vs `arrival_padding`. */
  def paddingCensus(batched: DataFrame): DataFrame = {
    def bill(batchCol: String) = batched
      .groupBy(col("shard"), col(batchCol).as("__b"))
      .agg((count(lit(1)) * max(col("n_tokens")) - sum(col("n_tokens"))).as("__pad"),
        sum(col("n_tokens")).as("__tok"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_batches"), sum(col("__pad")).as("padding"),
        sum(col("__tok")).as("n_tokens"))
    bill("sorted_batch")
      .withColumnRenamed("padding", "sorted_padding")
      .join(bill("arrival_batch").select(col("shard"),
        col("padding").as("arrival_padding")), "shard")
  }
}
