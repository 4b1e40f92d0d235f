package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to `SparkSession.internalCreateDataFrame` (package-private in
  * `org.apache.spark.sql`): wraps an already-encoded
  * `RDD[InternalRow]` as a DataFrame WITHOUT the public
  * `createDataFrame(RDD[Row], schema)` round-trip, which decodes every
  * InternalRow to an external Row and re-encodes it on every scan.
  * [[graft.core.Landed]] uses this to rebuild a localCheckpoint's
  * frame with fresh (default) stats while keeping probes a plain
  * columnar-batch-free scan of the pinned internal rows — the rebuild
  * is for planner stats only, so paying a per-row codec for it was
  * pure overhead (measured on q72's landing: the double conversion
  * showed up as a per-pass tax on both the producer's own aggregate
  * and every consumer probe). */
object InternalDF {
  def wrap(spark: SparkSession, rdd: RDD[InternalRow],
           schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
