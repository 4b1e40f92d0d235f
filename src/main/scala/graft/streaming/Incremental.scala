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

  /** Partition-grain snapshot diff (q172's kernel): checksum both
    * snapshots at the `partCol` grain with an order-independent
    * row-hash sum over `sigCols`, classify each partition. Returns
    * (partCol, old_rows, new_rows, status ∈ added | removed | changed
    * | unchanged) — |partitions| rows from two map-side-combined
    * aggregations and one full outer join. */
  def partitionDelta(old: DataFrame, neu: DataFrame, partCol: String,
                     sigCols: Seq[String]): DataFrame = {
    val rowSig = conv(substring(
      md5(concat_ws("|", sigCols.map(col): _*)), 1, 7), 16, 10).cast("long")
    def census(df: DataFrame, p: String) = df
      .groupBy(col(partCol))
      .agg(count(lit(1)).as(s"${p}_rows"), sum(rowSig).as(s"${p}_sig"))
    census(old, "old").join(census(neu, "new"), Seq(partCol), "full_outer")
      .select(col(partCol),
        coalesce(col("old_rows"), lit(0L)).as("old_rows"),
        coalesce(col("new_rows"), lit(0L)).as("new_rows"),
        when(col("new_rows").isNull, "removed")
          .when(col("old_rows").isNull, "added")
          .when(col("old_sig") === col("new_sig") &&
            col("old_rows") === col("new_rows"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Incremental stage re-run: recompute `stage` ONLY over the new
    * snapshot's added/changed partitions and splice the previous run's
    * outputs for unchanged ones (removed partitions drop out). The
    * partition list is |partitions|-sized and broadcasts into two
    * semi-joins, so the recompute plan scans just the changed slice —
    * at 100 TB the nightly run costs what the delta costs, not what
    * the corpus costs. `stage` must be partition-local (row-wise or
    * grouped within partCol), the same contract hive-partition
    * overwrite gives. */
  def recomputeChanged(prevOut: DataFrame, old: DataFrame, neu: DataFrame,
                       partCol: String, sigCols: Seq[String])
                      (stage: DataFrame => DataFrame): DataFrame = {
    val delta = partitionDelta(old, neu, partCol, sigCols)
    val dirty = delta.filter(col("status").isin("added", "changed"))
      .select(col(partCol))
    val clean = delta.filter(col("status") === "unchanged")
      .select(col(partCol))
    stage(neu.join(broadcast(dirty), Seq(partCol), "left_semi"))
      .unionByName(
        prevOut.join(broadcast(clean), Seq(partCol), "left_semi"))
  }

  /** Apply a CDC batch to a landed snapshot — the lakehouse MERGE /
    * upsert kernel: the batch carries (key, seq, op ∈ {I,U,D},
    * payload…); per key the HIGHEST seq wins (ties impossible by
    * contract: seq is a change-log position, unique per key), a
    * surviving I/U row replaces the snapshot row, a surviving D
    * deletes it, and untouched snapshot keys pass through. ONE
    * key-partitioned aggregation over the batch (max-seq winner via
    * int64 max over seq, winner row re-joined batch-side, both under
    * the same key exchange) + one full outer with the snapshot — the
    * snapshot is never sorted or windowed.
    *
    * `keyCol` must be unique in `snapshot`; payload columns are taken
    * positionally-by-name from both sides (snapshot columns ∪ batch
    * payload must agree). */
  def applyCdc(snapshot: DataFrame, batch: DataFrame,
               keyCol: String, seqCol: String, opCol: String): DataFrame = {
    val payload = snapshot.columns.filterNot(_ == keyCol).toSeq
    // max-seq winner: agg + same-key join, both sides under one key
    // exchange (renamed key on the agg side to keep the self-join
    // unambiguous)
    val winnerSeq = batch.groupBy(col(keyCol))
      .agg(max(col(seqCol)).as("__wseq"))
      .withColumnRenamed(keyCol, "__wk")
    val winner = batch
      .join(winnerSeq,
        col(seqCol) === col("__wseq") && col(keyCol) === col("__wk"))
      .select(col(keyCol) +:
        (col(opCol) === "D").as("__del") +:
        payload.map(c => col(c).as(s"__b_$c")): _*)
    snapshot.join(winner, Seq(keyCol), "full_outer")
      .filter(!coalesce(col("__del"), lit(false))) // D drops the key
      .select(col(keyCol) +: payload.map(c =>
        when(col("__del").isNotNull, col(s"__b_$c")) // batch won: I or U
          .otherwise(col(c)).as(c)): _*)
  }
}
