package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Exact._

/** Closed-form simple linear regression with Cook's distance — the
  * reference fits `lm(log(price+1) ~ log(kg+1))` and flags influential
  * points via `broom::augment`'s `.cooksd`
  * (`/root/reference/R/validation-functions.R:405-449`).
  *
  * Instead of a driver-side model fit, the slope/intercept come from
  * sufficient statistics (n, Σx, Σy, Σxx, Σxy) computed as exact
  * decimal-routed sums, and per-row leverage/residual/Cook's distance
  * are pure column arithmetic — fully distributed, two passes, no UDF.
  * For simple regression: h_i = 1/n + (x_i − x̄)²/Sxx,
  * D_i = r_i²/(p·s²) · h_i/(1−h_i)², p = 2.
  */
object Regression {

  /** Per-key sufficient statistics and fitted coefficients. SSE comes
    * from the same statistics in closed form (Σ(y−a−bx)² expanded), so
    * the whole fit is a single pass. Sums ride the scaled-long exact
    * path ([[graft.core.Exact.lsum6]]): order-independent and
    * engine-portable like the decimal route, ~7× faster; regression
    * features are log/standardized scale in every reference use, so the
    * int64 range guard (which nulls the fit rather than wrapping) has
    * orders of magnitude of headroom. */
  def fit(df: DataFrame, keys: Seq[String], x: String, y: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).cast("double").as("n"),
        lsum6(col(x)).as("sx"),
        lsum6(col(y)).as("sy"),
        lsum6(col(x) * col(x)).as("sxx"),
        lsum6(col(x) * col(y)).as("sxy"),
        lsum6(col(y) * col(y)).as("syy"))
      .withColumn("slope", {
        // degenerate groups (single point / constant x) have no defined
        // fit: null coefficients instead of an ANSI divide-by-zero
        val denom = col("n") * col("sxx") - col("sx") * col("sx")
        when(denom =!= 0.0,
          (col("n") * col("sxy") - col("sx") * col("sy")) / denom)
      })
      .withColumn("intercept", (col("sy") - col("slope") * col("sx")) / col("n"))
      .withColumn("sse",
        col("syy") + col("n") * col("intercept") * col("intercept") +
          col("slope") * col("slope") * col("sxx") -
          lit(2.0) * col("intercept") * col("sy") -
          lit(2.0) * col("slope") * col("sxy") +
          lit(2.0) * col("intercept") * col("slope") * col("sx"))

  /** Rows with residual, leverage and Cook's distance attached — one
    * data pass plus one broadcast join (SSE is closed-form in [[fit]]). */
  def cooksDistance(df: DataFrame, keys: Seq[String], x: String, y: String): DataFrame = {
    val coef = fit(df, keys, x, y)
    df.join(broadcast(coef), keys)
      .withColumn("resid", col(y) - (col("intercept") + col("slope") * col(x)))
      .withColumn("s2", col("sse") / (col("n") - 2.0))
      .withColumn("xbar", col("sx") / col("n"))
      .withColumn("sxx_c", col("sxx") - col("sx") * col("sx") / col("n"))
      .withColumn("leverage",
        lit(1.0) / col("n") +
          (col(x) - col("xbar")) * (col(x) - col("xbar")) / col("sxx_c"))
      .withColumn("cooksd",
        col("resid") * col("resid") / (lit(2.0) * col("s2")) *
          (col("leverage") / ((lit(1.0) - col("leverage")) * (lit(1.0) - col("leverage")))))
  }
}
