package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Flags-sheet synchronization (`/root/reference/R/validate-landings.R:264-337`):
  * the human-in-the-loop round-trip. The pipeline's freshly computed
  * alert rows are reconciled against the previously published sheet:
  *
  *  - submissions NOT yet on the sheet are appended as-is (new flags);
  *  - submissions already on the sheet keep the HUMAN-edited columns
  *    (`validated`, `validated_when_ymd`, `comments`) from the sheet and
  *    take the machine columns (`alert`, `submission_date`) from the
  *    pipeline; `flag_date` is kept from the sheet when the alert is
  *    unchanged (the flag is not "new" again) and refreshed to the
  *    pipeline's date when the alert changed.
  *
  * Both sides are keyed on submission_id; the sheet is dimension-sized
  * (one row per flagged submission) so the join broadcasts.
  *
  * Expected schema on both inputs: submission_id, submission_date,
  * flag_date, alert, validated, validated_when_ymd, comments.
  */
object FlagsSync {

  private val cols = Seq("submission_id", "submission_date", "flag_date",
    "alert", "validated", "validated_when_ymd", "comments")

  def sync(current: DataFrame, sheet: DataFrame): DataFrame = {
    val sheetKeys = sheet.select("submission_id")
    val newFlags = current
      .join(sheetKeys, Seq("submission_id"), "left_anti")
      .select(cols.map(col): _*)
    val merged = current
      .join(sheetKeys, Seq("submission_id"), "left_semi")
      .alias("x")
      .join(broadcast(sheet.alias("y")), Seq("submission_id"), "left")
      .select(
        col("submission_id"),
        col("x.submission_date").as("submission_date"),
        when(col("x.alert") === col("y.alert"), col("y.flag_date"))
          .otherwise(col("x.flag_date")).as("flag_date"),
        col("x.alert").as("alert"),
        col("y.validated").as("validated"),
        col("y.validated_when_ymd").as("validated_when_ymd"),
        col("y.comments").as("comments"))
    merged.unionByName(newFlags)
  }
}
