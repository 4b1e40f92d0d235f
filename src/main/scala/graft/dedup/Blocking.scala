package graft.dedup

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Candidate-pair blocking strategies for record linkage — the step
  * that keeps fuzzy matching (`functions/JaroWinkler`, q214/q254) off
  * the n² cliff. Equality blocking (q214's 6-char-prefix + length
  * key) is one arm; this file adds the other classic:
  * SORTED-NEIGHBORHOOD (Hernández & Stolfo, SIGMOD'95) — sort the
  * records by a lexicographic key and take every pair within a
  * sliding window of `w` positions. Equality blocks miss matches
  * whose keys differ in the first characters; a sorted window misses
  * matches that sort far apart — production linkage runs both and
  * unions the candidates (multi-pass blocking), which is exactly how
  * q256 composes it.
  *
  * Scale shape: one range-sort + `zipWithIndex` for the global
  * position (per-partition offsets from one count pass — the
  * SuffixArray/dense-rank idiom, never a single-reducer window),
  * then `w` equi-joins on (idx + j) — candidate count is exactly
  * w·(n−…) ≈ w·n, LINEAR in the corpus at any size, no block-depth
  * skew by construction (the property equality blocking lacks — a
  * hot key deepens its block; a sorted window cannot deepen). */
object Blocking {

  /** Window-`w` sorted-neighborhood candidate pairs.
    *
    * @return (ka, kb, j): record keys of each candidate pair, `j` the
    *         positional gap (1..w); ka sorts strictly before kb in
    *         (sortKey, id) order, so each unordered pair appears once */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
                              sortKeyCol: String, w: Int): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long").as("k"),
      col(sortKeyCol).as("sk"))
    val idxRdd = base.orderBy(col("sk"), col("k")).rdd.zipWithIndex()
      .map { case (r, i) => Row(r.getLong(0), i) }
    val idx = spark.createDataFrame(idxRdd, StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("idx", LongType, nullable = false))))
      .localCheckpoint(eager = false) // both sides of the offset join
    val offsets = idx.select(col("k").as("ka"), col("idx"),
      explode(sequence(lit(1L), lit(w.toLong))).as("j"))
    offsets
      .join(idx.select(col("k").as("kb"), col("idx").as("__bidx")),
        col("__bidx") === col("idx") + col("j"))
      .select(col("ka"), col("kb"), col("j"))
  }
}
