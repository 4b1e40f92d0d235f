package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-overlap auditing via KMV sketch set operations (builder
  * mandate: the "how much does source A duplicate source B" question a
  * training-data pipeline asks before mixing corpora — pairwise, over
  * every source, without ever joining the full shingle sets).
  *
  * Each group's sketch is its k smallest distinct element hashes
  * ([[graft.functions.KMinHashes]], bounded k·|hash| memory, map-side
  * partials). For a pair (A, B) the k smallest of S_A ∪ S_B form the
  * union's sketch U_k; |S_A ∩ S_B ∩ U_k| / |U_k| estimates Jaccard
  * (each of U_k's members is a uniform random distinct element of
  * A ∪ B, hit iff it's in both), and the KMV estimator (k−1)/frac(kth)
  * on U_k estimates |A ∪ B| — so intersection ≈ jaccard · union. When
  * the merged sketch holds fewer than k hashes both sketches are
  * complete sets and every figure is exact.
  *
  * Everything is md5-derived and order-independent, so estimates are
  * reproducible on any engine at any parallelism (the q103 oracle
  * replays them bit-for-bit). Scale shape: one bounded-buffer aggregate
  * over the elements (the only pass over data); the pair stage is
  * |groups|² rows of per-row array arithmetic on k-element arrays —
  * source/shard grains have few groups, and no shuffle touches the
  * element sets again.
  */
object Overlap {

  /** First 8 hex chars of a hash as a uniform fraction of 2³². */
  private def frac(h: Column): Column =
    conv(substring(h, 1, 8), 16, 10).cast("double") / lit(4294967296.0)

  /** Pairwise overlap estimates between every two groups:
    * (groupCol_a, groupCol_b, nd_a, nd_b, est_union, est_intersection,
    * est_jaccard) for all unordered pairs, both orders' distinct counts
    * exact (they ride the sketch aggregate). `hashCol` must be a hex
    * hash string (e.g. `md5(...)`) — hex order ≡ numeric order. */
  def kmvOverlap(df: DataFrame, groupCol: String, hashCol: String,
                 k: Int): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    graft.functions.KMinHashes.register(df.sparkSession)
    val sk = df.groupBy(col(groupCol))
      .agg(
        call_function("k_min_hashes", col(hashCol), lit(k)).as("mins"),
        countDistinct(col(hashCol)).as("nd"))
    val a = sk.select(col(groupCol).as("__ga"), col("mins").as("__ma"),
      col("nd").as("nd_a"))
    val b = sk.select(col(groupCol).as("__gb"), col("mins").as("__mb"),
      col("nd").as("nd_b"))
    a.crossJoin(b).filter(col("__ga") < col("__gb"))
      .withColumn("__m", array_sort(array_distinct(concat(col("__ma"), col("__mb")))))
      .withColumn("__uk", slice(col("__m"), 1, k))
      .withColumn("__usz", size(col("__uk")))
      .withColumn("__hit",
        size(array_intersect(col("__uk"),
          array_intersect(col("__ma"), col("__mb")))))
      .withColumn("est_union",
        when(size(col("__m")) < k, size(col("__m")).cast("double"))
          .otherwise(lit(k - 1.0) / frac(element_at(col("__uk"), k))))
      .withColumn("est_jaccard",
        col("__hit").cast("double") / col("__usz").cast("double"))
      .withColumn("est_intersection", col("est_jaccard") * col("est_union"))
      .select(col("__ga").as(s"${groupCol}_a"), col("__gb").as(s"${groupCol}_b"),
        col("nd_a"), col("nd_b"),
        col("est_union"), col("est_intersection"), col("est_jaccard"))
  }
}
