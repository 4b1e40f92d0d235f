package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Approximate-nearest-neighbour search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline and
  * a random-hyperplane LSH bucketed variant as the scale path.
  *
  * Numeric determinism: float summation is order-dependent, so dot
  * products and norms are computed in DECIMAL — each float element is
  * cast to DECIMAL(18,9) (deterministic), products are exact decimals,
  * and Spark's decimal SUM aggregate is exact and associative. Only the
  * final cosine division happens in doubles (sqrt is IEEE correctly-
  * rounded), so results are bit-identical at any parallelism and
  * reproducible by any engine. (A lambda-`aggregate` fold is avoided:
  * decimal `+` inside a lambda grows precision past 38 and silently
  * truncates scale.)
  */
object Knn {
  private val ElemDec = DecimalType(18, 9)
  private val AccDec = DecimalType(38, 18)

  /** (id, i, e): one row per vector element, decimal-cast. */
  def elements(df: DataFrame, idCol: String, vecCol: String,
               idAs: String, eAs: String): DataFrame =
    df.select(col(idCol).as(idAs), posexplode(col(vecCol)).as(Seq("i", "__e")))
      .select(col(idAs), col("i"), col("__e").cast(ElemDec).as(eAs))

  /** Exact squared L2 norms per id, as double. */
  def norms(el: DataFrame, idAs: String, eAs: String, normAs: String): DataFrame =
    el.groupBy(col(idAs)).agg(sum(col(eAs) * col(eAs)).cast(DoubleType).as(normAs))

  /** Brute-force cosine top-k: each query row (small side, broadcast as
    * an element table) against the full corpus. One shuffle for the
    * (qid, nid) partial-aggregated dot products; corpus norms computed
    * once. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val ce = elements(corpus, idCol, vecCol, "nid", "ce")
    val qe = elements(queries, idCol, vecCol, "qid", "qe")
    val cn = norms(ce, "nid", "ce", "nn2")
    val qn = norms(qe, "qid", "qe", "qn2")
    val dot = ce.join(broadcast(qe), Seq("i"))
      .filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qe") * col("ce")).cast(DoubleType).as("dot"))
    val scored = dot
      .join(broadcast(qn), Seq("qid"))
      .join(cn, Seq("nid"))
      .withColumn("cos", col("dot") / (sqrt(col("qn2")) * sqrt(col("nn2"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }

  /** All near-dup pairs with cosine ≥ threshold within `df` (optionally
    * pre-filtered). All-pairs on the dot side — use LSH buckets first at
    * scale. */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val ae = elements(df, idCol, vecCol, "va", "ea")
    val be = elements(df, idCol, vecCol, "vb", "eb")
    val an = norms(ae, "va", "ea", "na2")
    val bn = norms(be, "vb", "eb", "nb2")
    val dot = ae.join(be, Seq("i"))
      .filter(col("va") < col("vb"))
      .groupBy(col("va"), col("vb"))
      .agg(sum(col("ea") * col("eb")).cast(DoubleType).as("dot"))
    dot.join(broadcast(an), Seq("va"))
      .join(broadcast(bn), Seq("vb"))
      .withColumn("cos", col("dot") / (sqrt(col("na2")) * sqrt(col("nb2"))))
      .filter(col("cos") >= threshold)
      .select(col("va"), col("vb"), col("cos"))
  }

  /** Exact per-group mean embedding as (group, i, mean_e) rows — the
    * centroid computation IVF training and label-profile analyses need.
    * Decimal-summed per dimension, so centroids are bit-identical at any
    * parallelism; one shuffle on (group, i), map-side combined. Row form
    * (not array) keeps the shuffle rows tiny and lets callers pivot or
    * re-assemble as needed. */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("i", "__e")))
      .select(col("grp"), col("i"), col("__e").cast(ElemDec).as("e"))
      .groupBy(col("grp"), col("i"))
      .agg((sum(col("e")).cast(DoubleType) / count(col("e"))).as("mean_e"))

  /** Uniform vector length of `vecCol`, from the first row; explicit
    * error on an empty frame (head() would throw NoSuchElementException). */
  def inferDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).limit(1).collect().headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        s"cannot infer vector dim of '$vecCol' from an empty DataFrame; pass dim explicitly"))

  /** Deterministic ±1 hyperplane component for (table, plane, dim):
    * parity of the first md5 hex digit of "t:p:i". Computed driver-side
    * — the matrix is tables×planes×dims literals, schema-sized. */
  private def signComponent(t: Int, p: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$t:$p:$i".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) % 2 == 1) 1.0 else -1.0
  }

  /** Random-hyperplane LSH buckets, AND-OR construction: `numTables`
    * independent hash tables of `numPlanes` sign bits each. Output one
    * row per (id, table) with the table-local bucket.
    *
    * Shuffle-free: the hyperplanes are literal ±1 arrays baked into the
    * plan, each projection is a per-row `zip_with`+`aggregate` fold, and
    * the bucket bits assemble inline — no explode, no exchange, full
    * codegen. Rows sharing a (table, bucket) are candidate neighbours;
    * more tables trade compute for recall. */
  def hyperplaneBuckets(df: DataFrame, idCol: String, vecCol: String,
                        numPlanes: Int, numTables: Int,
                        dim: Option[Int] = None): DataFrame = {
    // vectors must share one length; pass `dim` to skip the probe job
    val d = dim.getOrElse(inferDim(df, vecCol))
    def proj(t: Int, p: Int): Column = {
      val signs = array((0 until d).map(i => lit(signComponent(t, p, i))): _*)
      aggregate(
        zip_with(col(vecCol), signs, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
    }
    def bucket(t: Int): Column =
      (0 until numPlanes).map { p =>
        when(proj(t, p) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    val tables = explode(array((0 until numTables).map(t =>
      struct(lit(t).as("t"), bucket(t).as("bucket"))): _*))
    df.select(col(idCol).as("id"), tables.as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
  }

  /** LSH-bucketed ANN: top-k among candidates that share a bucket with
    * the query in ANY table. Same schema as [[bruteForceTopK]]; recall
    * < 1 by construction (measured in tests against the brute-force
    * baseline). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int, numTables: Int = 4): DataFrame = {
    val dim = Some(inferDim(corpus, vecCol)) // one probe job for both sides
    val cb = hyperplaneBuckets(corpus, idCol, vecCol, numPlanes, numTables, dim)
      .withColumnRenamed("id", "nid")
    val qb = hyperplaneBuckets(queries, idCol, vecCol, numPlanes, numTables, dim)
      .withColumnRenamed("id", "qid")
    val cand = cb.join(broadcast(qb), Seq("t", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid")).distinct()
    val ce = elements(corpus, idCol, vecCol, "nid", "ce")
      .join(cand, Seq("nid"), "left_semi")
    val qe = elements(queries, idCol, vecCol, "qid", "qe")
    val cn = norms(ce, "nid", "ce", "nn2")
    val qn = norms(qe, "qid", "qe", "qn2")
    val dot = ce.join(broadcast(qe), Seq("i"))
      .join(cand, Seq("qid", "nid"), "left_semi")
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qe") * col("ce")).cast(DoubleType).as("dot"))
    val scored = dot
      .join(broadcast(qn), Seq("qid"))
      .join(cn, Seq("nid"))
      .withColumn("cos", col("dot") / (sqrt(col("qn2")) * sqrt(col("nn2"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }
}
