package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-batch primitives — the reference's ingestion patterns
  * (SURVEY §2.10): high-water-mark re-ingest (Kobo `since_id`,
  * `/root/reference/R/retrieve-survey-data.R:140-147`) and process-once
  * via anti-join on already-processed ids
  * (`R/preprocess-landings.R:267-271`, `R/ingest-pds-data.R:181`).
  *
  * Both compile to single distributed plans: the high-water mark is a
  * scalar aggregate of the sink (partition-pruned when the sink is
  * partitioned by the watermark column), and process-once is a
  * `left_anti` join against the done-set's key column only.
  */
object Incremental {

  /** Rows of `source` strictly above the sink's high-water mark (or all
    * rows when the sink is absent/empty). */
  def aboveHighWaterMark(spark: SparkSession, source: DataFrame,
                         sinkPath: String, idCol: String): DataFrame = {
    // Only a missing/empty sink means "ingest everything". Transient I/O
    // or corruption errors must propagate — swallowing them would
    // silently re-ingest the full source and break process-once. The
    // mark compares in the column's OWN type: casting to long would
    // truncate fractional/timestamp marks and re-ingest the boundary row.
    val hwm: Option[Any] =
      try {
        val r = spark.read.parquet(sinkPath).agg(max(col(idCol))).head()
        if (r.isNullAt(0)) None else Some(r.get(0))
      } catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" ||
               e.getCondition == "UNABLE_TO_INFER_SCHEMA" => None
      }
    hwm.fold(source)(m => source.filter(col(idCol) > lit(m)))
  }

  /** Process-once: drop source rows whose key already exists in the
    * done-set (anti-join on the pruned key column). */
  def notYetProcessed(source: DataFrame, done: DataFrame, key: String): DataFrame =
    source.join(done.select(key), Seq(key), "left_anti")
}
