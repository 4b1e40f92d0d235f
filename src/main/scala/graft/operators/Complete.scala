package graft.operators

import org.apache.spark.sql.DataFrame

/** `tidyr::complete` (SURVEY §2.4 A11): expand a frame to the full grid
  * of key combinations, introducing null rows for absent combinations
  * (`R/estimate-catch.R:131-135,280-282`). The caller supplies the grid
  * (usually a spine crossJoin of distinct key sets) so that at scale the
  * grid is generated, not collected.
  */
object Complete {
  def complete(df: DataFrame, grid: DataFrame, keys: Seq[String]): DataFrame =
    grid.join(df, keys, "left")
}
