package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time helpers for the reference's binning semantics (SURVEY
  * §2.8): the Sunday-start week floor (`lubridate::floor_date(x,
  * "week", week_start = 7)`, `/root/reference/R/format-public-data.R:366-372`)
  * and the current-period proration used in the 4-grain rollups
  * (`R/format-public-data.R:470-499`).
  */
object Dates {

  /** Floor a date/timestamp to the preceding (or same) Sunday.
    * `dayofweek` is 1=Sunday..7=Saturday, so subtracting
    * `dayofweek - 1` days lands on Sunday. Returns DateType. */
  def floorWeekSunday(c: Column): Column =
    date_sub(to_date(c), dayofweek(to_date(c)) - lit(1))

  /** Fraction of the period [start, nextStart) elapsed at `now` —
    * the reference scales the still-open period's totals by
    * elapsed/period_length before comparing periods. Doubles, single
    * division: deterministic. */
  def elapsedFraction(start: Column, nextStart: Column, now: Column): Column = {
    val len = datediff(to_date(nextStart), to_date(start)).cast("double")
    val gone = datediff(to_date(now), to_date(start)).cast("double")
    least(greatest(gone / len, lit(0.0)), lit(1.0))
  }

  /** `tidyr::unite(..., sep = "-", na.rm = TRUE)` for alert codes
    * (`R/validate-landings.R:211-229`): concatenate non-null codes with
    * '-' (null when all inputs are null → empty string per concat_ws;
    * callers treat "" as no-alert). */
  def uniteCodes(cols: Seq[Column]): Column =
    concat_ws("-", cols.map(_.cast("string")): _*)
}
