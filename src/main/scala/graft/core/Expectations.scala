package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract audit — the generic form of the pipeline's
  * hand-written metadata gates (tinytest column checks, flags-sheet
  * validation; the reference's `inst/tinytest` suite): declare the
  * expectations a table must satisfy, evaluate them ALL in one
  * structured report frame a scheduler can gate on.
  *
  * Evaluation cost is what a 100 TB table allows:
  * - every row-level rule folds into ONE map-side-combined aggregation
  *   over a single scan (one wide agg row, reshaped to long) — adding a
  *   rule adds a counter, not a pass;
  * - a unique-key expectation is one groupBy(key) census;
  * - each referential-integrity expectation is one left-anti join
  *   against the parent (broadcast when the parent is a dim).
  */
object Expectations {
  /** A row-level rule: rows where `ok` is false (or null) violate. */
  final case class RowRule(rule: String, ok: Column)

  /** Audit `df` against row rules + an optional unique key + foreign
    * keys. Returns one row per rule: (rule, n_rows, n_bad, bad_share),
    * ordered by rule name. `foreignKeys` maps rule name → (parent
    * frame, childCol, parentCol). */
  def audit(
      df: DataFrame,
      rowRules: Seq[RowRule],
      uniqueKey: Option[Seq[String]] = None,
      foreignKeys: Seq[(String, DataFrame, String, String)] = Nil): DataFrame = {
    val aggs = count(lit(1)).as("__n") +:
      rowRules.map(r =>
        sum(when(r.ok.isNull || !r.ok, 1L).otherwise(0L)).as(s"__v_${r.rule}"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val long = wide.select(explode(array(rowRules.map(r =>
      struct(lit(r.rule).as("rule"), col("__n").as("n_rows"),
        col(s"__v_${r.rule}").as("n_bad"))): _*)).as("e"))
      .select(col("e.rule"), col("e.n_rows"), col("e.n_bad"))

    val uniq = uniqueKey.map { keys =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__kn"))
        .agg(sum(col("__kn")).as("n_rows"),
          sum(col("__kn") - lit(1L)).as("n_bad"))
        .select(lit(s"unique:${keys.mkString(",")}").as("rule"),
          col("n_rows"), col("n_bad"))
    }
    val fks = foreignKeys.map { case (name, parent, childCol, parentCol) =>
      val orphans = df.select(col(childCol))
        .join(parent.select(col(parentCol).as(childCol)),
          Seq(childCol), "left_anti")
        .agg(count(lit(1)).as("n_bad"))
      df.agg(count(lit(1)).as("n_rows")).crossJoin(orphans)
        .select(lit(s"fk:$name").as("rule"), col("n_rows"), col("n_bad"))
    }
    (Seq(long) ++ uniq.toSeq ++ fks)
      .reduce(_ unionByName _)
      .withColumn("bad_share",
        round(col("n_bad").cast("double") / col("n_rows").cast("double"), 6))
  }
}
