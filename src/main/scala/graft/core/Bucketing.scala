package graft.core

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers — the co-located-join strategy for the
  * engine's recurring fact↔fact joins (landings↔trips on (date, imei),
  * orders↔lineitem on the order key). Writing both sides bucketed and
  * sorted by the join key lets every subsequent join and aggregation on
  * that key run without an Exchange: at 100 TB the shuffle *is* the
  * cost, so tables that join repeatedly should be stored pre-shuffled.
  * Verified by BucketingSpec (the join plan contains no Exchange).
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted data-source table.
    * `numBuckets` should match downstream parallelism (executor-count
    * scale, powers of two compose well). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
