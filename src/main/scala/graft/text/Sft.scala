package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-log → SFT training-pair assembly — the step that turns
  * raw chat/session transcripts into (prompt, response) rows for
  * supervised fine-tuning: within each conversation, every turn by the
  * TARGET role becomes one example whose prompt is the full ordered
  * history before it ("role: text" lines) and whose response is the
  * turn itself.
  *
  * One window pass per conversation (ROWS UNBOUNDED PRECEDING .. 1
  * PRECEDING running concatenation over the total (ordCols) order) —
  * no self-join, no per-turn explosion — and conversations partition
  * freely across executors. Note the OUTPUT is inherently quadratic
  * in turns-per-conversation (each example carries its full history),
  * which is the artifact's own size, not plan overhead; for very long
  * transcripts cap the history upstream (sliding window over turns)
  * before assembly, exactly as SFT context budgets do. Deterministic:
  * the caller supplies a total order, so the assembled prompt bytes
  * are engine-exact (the q196 oracle rebuilds them with an ordered
  * list window). */
object Sft {

  /** @param convCols conversation key columns
    * @param ordCols  total order within a conversation (must be
    *                 unique per conversation — ties would make the
    *                 prompt text nondeterministic)
    * @param targetRole rows with this `roleCol` value become examples
    * @return convCols ++ (turn_idx, n_history, prompt, response) */
  def pairs(turns: DataFrame, convCols: Seq[String], ordCols: Seq[String],
            roleCol: String, textCol: String, targetRole: String,
            sep: String = "\n"): DataFrame = {
    val w = Window.partitionBy(convCols.map(col): _*)
      .orderBy(ordCols.map(col(_).asc): _*)
    val hist = w.rowsBetween(Window.unboundedPreceding, -1)
    turns
      .withColumn("__turn", row_number().over(w))
      .withColumn("__prompt", array_join(
        collect_list(concat(col(roleCol), lit(": "), col(textCol))).over(hist),
        sep))
      .filter(col(roleCol) === targetRole)
      .select(convCols.map(col) ++ Seq(
        col("__turn").as("turn_idx"),
        (col("__turn") - 1).as("n_history"),
        col("__prompt").as("prompt"),
        col(textCol).as("response")): _*)
  }
}
