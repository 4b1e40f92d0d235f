package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget subset selection — the final stage of a mixture plan:
  * given a per-group token budget (from the mixing planner's weights ×
  * the run's total), keep the best-scoring documents whose cumulative
  * token count fits.
  *
  * One window per group (score-ordered running sum, integer
  * arithmetic), so the whole selection is a single shuffle on the
  * group key and deterministic on any engine — no sampling, no
  * collect, no iteration. The score is caller-supplied (quality model
  * output, LM log-prob, a curriculum phase — anything totally ordered);
  * ties break by `tiebreak` so equal scores never make the selection
  * partition-dependent. Groups are typically languages/sources (tens
  * to thousands): far more groups than executors, so the window
  * parallelizes; a single giant group degrades to one task — pre-split
  * such groups into shards and budget per shard.
  */
object Budget {

  /** Rows whose cumulative `tokensCol` (in `scoreCol` DESC, `tiebreak`
    * ASC order, current row inclusive) fits within `budget`, per group.
    * A document larger than the remaining budget is skipped along with
    * everything after it (contiguous prefix — the deterministic,
    * engine-portable contract; first-fit packing of the tail is
    * [[Packing.packFirstFit]]'s job, not selection's). */
  def selectUnderBudget(docs: DataFrame, groupCols: Seq[String],
                        scoreCol: Column, tokensCol: Column,
                        tiebreak: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(scoreCol.desc, tiebreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("__cum_tokens", sum(tokensCol).over(w))
      .filter(col("__cum_tokens") <= budget)
      .drop("__cum_tokens")
  }
}
