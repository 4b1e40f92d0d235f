package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Exact

/** Hashed-feature logistic regression — the "quality classifier" stage
  * of LLM data curation (builder mandate): a small linear model scores
  * every crawl document against a high-quality reference class, and
  * the pipeline keeps/reweights by that score (the GPT-3 / LLaMA
  * data-filtering recipe, fastText-shaped: bag of hashed words → linear
  * model → sigmoid).
  *
  * Scale shapes:
  *  - [[hashedFeatures]]: one explode + (doc, bucket) count — feature
  *    extraction is a map-side-combinable aggregation, never a
  *    vocabulary join (the hash IS the vocabulary, md5-derived and
  *    engine-portable).
  *  - [[train]]: full-batch gradient descent where EACH iteration is
  *    two bounded shuffles (scores keyed by doc, gradients keyed by
  *    feature bucket) plus a dim-bounded collect of the gradient
  *    vector; the feature frame is computed once and cached, weights
  *    re-broadcast per iteration as a dim-row frame (broadcast hash
  *    join — codegen'd, no UDF in the hot path). Nothing driver-side
  *    ever scales with the corpus.
  *  - Determinism: every distributed sum routes through
  *    [[Exact.dsum]] (decimal-routed, order-independent), so the
  *    learned weights are identical at any parallelism/partitioning —
  *    the same seeded-determinism contract (ST8) the rest of the
  *    engine holds. Gradient quantization at the decimal's 1e-6 is
  *    noise orders below the learning rate.
  */
object HashedLogReg {

  /** A trained model: `weights(i)` for hash bucket i, plus bias. */
  final case class Model(weights: Array[Double], bias: Double,
                         dim: Int, salt: String)

  private def bucket(token: Column, dim: Int, salt: String): Column =
    (conv(substring(md5(concat_ws("-", lit(salt), token)), 1, 7), 16, 10)
      .cast("long") % dim).as("idx")

  /** Hashed bag-of-words: one row per (doc, bucket) with the token-
    * occurrence count landing there. */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
                     dim: Int, salt: String = "fh"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    df.select(col(idCol).as("__doc"),
        explode(graft.text.TextFunctions.wsTokens(col(textCol))).as("__tok"))
      .select(col("__doc"), bucket(col("__tok"), dim, salt))
      .groupBy(col("__doc"), col("idx"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Full-batch logistic-regression training. `labeled` must carry
    * `idCol`, `textCol` and a 0/1 `labelCol`. Returns the model after
    * `iters` steps of gradient descent at rate `lr` (weights start at
    * zero, so the trajectory is fully determined by the data). */
  def train(labeled: DataFrame, idCol: String, textCol: String,
            labelCol: String, dim: Int, iters: Int, lr: Double,
            salt: String = "fh"): Model = {
    require(iters >= 0 && lr > 0, s"need iters >= 0 and lr > 0")
    val spark = labeled.sparkSession
    val feats = hashedFeatures(labeled, idCol, textCol, dim, salt)
      .withColumnRenamed("__doc", "__id").cache()
    val labels = labeled.select(col(idCol).as("__id"),
      col(labelCol).cast("double").as("__y")).cache()
    val n = labels.count().toDouble // materializes both caches' parent
    val w = Array.fill(dim)(0.0)
    var b = 0.0
    var it = 0
    while (it < iters && n > 0) {
      import spark.implicits._
      val wDF = w.toSeq.zipWithIndex.map { case (wv, i) => (i.toLong, wv) }
        .toDF("idx", "__w")
      val scores = feats.join(broadcast(wDF), Seq("idx"))
        .groupBy(col("__id"))
        .agg(Exact.dsum(col("cnt") * col("__w")).as("__z"))
      // left join: a doc with no tokens still trains the bias
      val err = labels.join(scores, Seq("__id"), "left")
        .select(col("__id"),
          (lit(1.0) / (lit(1.0) + exp(-(coalesce(col("__z"), lit(0.0)) + b)))
            - col("__y")).as("__e"))
      val grads = feats.join(err, Seq("__id"))
        .groupBy(col("idx"))
        .agg(Exact.dsum(col("cnt") * col("__e")).as("__g"))
        .collect() // dim-bounded
      val gb = err.agg(Exact.dsum(col("__e"))).head().getDouble(0)
      grads.foreach(r => w(r.getLong(0).toInt) -= lr * r.getDouble(1) / n)
      b -= lr * gb / n
      it += 1
    }
    feats.unpersist(); labels.unpersist()
    Model(w, b, dim, salt)
  }

  /** Score every document: input columns + `quality_score` = σ(w·x+b).
    * The weight lookup is the same broadcast dim-row join as training —
    * per-document work is its own feature count, nothing global. */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wDF = model.weights.toSeq.zipWithIndex
      .map { case (wv, i) => (i.toLong, wv) }.toDF("idx", "__w")
    val z = hashedFeatures(df, idCol, textCol, model.dim, model.salt)
      .join(broadcast(wDF), Seq("idx"))
      .groupBy(col("__doc").as(idCol))
      .agg(Exact.dsum(col("cnt") * col("__w")).as("__z"))
    df.join(z, Seq(idCol), "left")
      .withColumn("quality_score",
        lit(1.0) / (lit(1.0) + exp(-(coalesce(col("__z"), lit(0.0)) + model.bias))))
      .drop("__z")
  }
}
