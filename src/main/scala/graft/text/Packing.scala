package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches (builder mandate: the
  * operations a large-scale training-data pipeline needs): documents
  * are laid out into fixed token-capacity bins by contiguous fill —
  * the concat-and-chunk discipline production tokenizers use — so a
  * downstream batcher reads whole bins.
  *
  * Global first-fit packing is inherently sequential; the scalable
  * discipline is SHARD-LOCAL: documents hash into shards, each shard
  * packs independently with a running token total (one window per
  * shard, no global sort, no driver loop). Utilization loss vs global
  * packing is bounded by one partial bin per shard — negligible at any
  * shard count worth running. All arithmetic is integer, so bin
  * assignments are bit-reproducible at any parallelism.
  */
object Packing {

  /** Assign each document a (shard, bin, offset): shard =
    * `hash mod nShards` (md5-derived — engine-portable), bin = the
    * fixed-capacity bin the document starts in under contiguous fill in
    * `ordCol` order, offset = tokens already in the bin before it.
    * Documents longer than `capacity` get bins of their own (their
    * `spans_bins` flag marks the overflow — callers chunk or drop). */
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

  /** Per-bin census: document count, token fill, utilization. */
  def binStats(packed: DataFrame, capacity: Long): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (sum(col("n_tokens")).cast("double") / capacity).as("fill_ratio"))
}
