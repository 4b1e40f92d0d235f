package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Cross-rater quantile normalization — the score-harmonization step
  * an annotation pipeline runs when raters use the 0–1 scale
  * differently (one rater's "0.6" is another's "0.9"): each rater's
  * scores map through their own empirical CDF onto the POOLED score
  * distribution, so every rater ends up with the same marginal and
  * only the per-rater ORDERING survives. The classical rank-based
  * normalization (Bolstad et al. 2003's microarray form, single
  * reference = the pooled sample).
  *
  * Semantics: a score with within-rater rank k of n_r (ties broken by
  * the item id, deterministic) takes quantile q = (k − 0.5)/n_r, and
  * the output is the pooled distribution's type-7 quantile at q —
  * pos = q·(N − 1) over the pooled order, linear interpolation
  * between the straddling pooled values, the exact arithmetic of
  * [[SortPercentile]] so results are bit-reproducible.
  *
  * Scale shape: the within-rater window shuffles once on rater; the
  * pooled positions come from the range-sort + zipWithIndex
  * discipline (never a single-reducer window); the lookup is two
  * shuffle equi-joins on an int64 position. N (one scalar) is a
  * driver-side count — the entry-point pattern.
  *
  * @return (raterCol, itemCol, scoreCol, normalized) */
object QuantileNorm {

  def toPooled(df: DataFrame, raterCol: String, itemCol: String,
               scoreCol: String): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col(raterCol).as("rater"), col(itemCol).as("item"),
      col(scoreCol).cast("double").as("score"))
    val n = base.count()
    val wR = Window.partitionBy(col("rater"))
      .orderBy(col("score"), col("item"))
    val wN = Window.partitionBy(col("rater"))
    val ranked = base
      .withColumn("__k", row_number().over(wR))
      .withColumn("__n", count(lit(1)).over(wN))
      .withColumn("__pos",
        (col("__k").cast("double") - lit(0.5)) / col("__n")
          * lit((n - 1).toDouble))
      .withColumn("__lo", floor(col("__pos")).cast("long"))
      .withColumn("__hi", ceil(col("__pos")).cast("long"))
    // pooled 0-based positions via distributed range sort + one count
    // pass — the SuffixArray.withDenseRank discipline
    val orderedPool = base.orderBy(col("score"), col("rater"), col("item"))
      .select(col("score").as("__v"))
    val poolRdd = orderedPool.rdd.zipWithIndex()
      .map { case (r, i) => Row(r.getDouble(0), i) }
    val pool = spark.createDataFrame(poolRdd,
      StructType(Seq(StructField("__v", org.apache.spark.sql.types.DoubleType,
        nullable = false), StructField("__p", LongType, nullable = false))))
      .localCheckpoint(eager = false) // joined twice (lo and hi sides)
    ranked
      .join(pool.select(col("__p").as("__lo"), col("__v").as("__vlo")),
        Seq("__lo"))
      .join(pool.select(col("__p").as("__hi"), col("__v").as("__vhi")),
        Seq("__hi"), "left")
      .select(col("rater").as(raterCol), col("item").as(itemCol),
        col("score").as(scoreCol),
        when(col("__hi") === col("__lo") || col("__vhi").isNull, col("__vlo"))
          .otherwise((ceil(col("__pos")) - col("__pos")) * col("__vlo") +
            (col("__pos") - floor(col("__pos"))) * col("__vhi"))
          .as("normalized"))
  }
}
