package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benjamini–Hochberg false-discovery-rate control (Benjamini &
  * Hochberg 1995) over EXACT rational p-values — the multiple-testing
  * gate a pipeline needs the moment it runs one significance test per
  * segment (per language, per domain, per annotator): at α = 0.05 a
  * 1000-segment drift scan "finds" ~50 drifts by chance; BH caps the
  * expected false-discovery fraction instead.
  *
  * The step-up rule — reject the k smallest p-values where
  * k = max{ i : p₍ᵢ₎ ≤ i·α/m } — is replayed with INTEGER
  * cross-multiplication (p_num·m·αDen ≤ i·αNum·p_den), so which
  * hypotheses get rejected is bit-exact on any engine; only the SORT
  * key uses the (deterministic, exactly-rounded) IEEE quotient.
  * Exact rational p-values are what the engine's resampling tests
  * produce natively (q244's Poisson-bootstrap sign counts, q168's DP
  * census counts) — nothing here needs an erf/Φ approximation.
  *
  * Scale shape: the input is one row per HYPOTHESIS (thousands at
  * most, after whatever heavy aggregation produced the p-values), so
  * the single-partition rank window and the two 1-row scalar
  * cross-joins are bounded by the test count, never the data size.
  */
object Fdr {

  /** Append BH (rank, rejected) to a one-row-per-hypothesis frame.
    *
    * @param df       one row per hypothesis
    * @param tieCols  deterministic tie-break for equal p-values
    * @param pNum     exact p-value numerator (integral)
    * @param pDen     exact p-value denominator (integral, > 0; may
    *                 differ per row)
    * @param alphaNum target FDR numerator (α = alphaNum/alphaDen)
    */
  def benjaminiHochberg(df: DataFrame, tieCols: Seq[String],
                        pNum: Column, pDen: Column,
                        alphaNum: Long, alphaDen: Long): DataFrame = {
    require(alphaNum > 0 && alphaDen > 0)
    val w = Window.orderBy(
      (pNum.cast("double") / pDen.cast("double")).asc +: tieCols.map(col(_).asc): _*)
    val ranked = df
      .withColumn("__pn", pNum.cast("long"))
      .withColumn("__pd", pDen.cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
    val m = ranked.agg(count(lit(1)).as("__m"))
    // both cross-multiplied sides routed through DECIMAL(38,0): with
    // large exact denominators (e6-scaled or combinatorial p_den) and
    // many hypotheses the int64 products overflow and ANSI aborts —
    // decimal keeps the comparison bit-exact for any caller, not just
    // small inputs like q271's (p_den=32, m=5)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val sat = ranked.crossJoin(m) // 1-row scalar broadcast
      .withColumn("__sat",
        col("__pn").cast(dec) * col("__m") * lit(alphaDen) <=
          col("rank").cast(dec) * lit(alphaNum) * col("__pd"))
    val kstar = sat.agg(max(when(col("__sat"), col("rank"))).as("__k"))
    sat.crossJoin(kstar) // 1-row scalar broadcast
      .withColumn("rejected", col("rank") <= coalesce(col("__k"), lit(0L)))
      .drop("__pn", "__pd", "__m", "__sat", "__k")
  }
}
