package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sorted-neighbor longest-common-prefix census — the KV-cache /
  * prefix-cache planning signal for a serving deployment: a prompt
  * cache keyed on prefixes can reuse, for each document, exactly its
  * longest common prefix with SOME other document, and in
  * lexicographic order that maximum is always attained at one of the
  * two sorted neighbors (prefix order is compatible with string
  * order), so ONE global sort answers the all-pairs question. The
  * reference has no serving layer; the sorted-neighbor trick is the
  * same one its dedup vocabulary uses for suffix runs
  * ([[SuffixArray.prefixRuns]]).
  *
  * The neighbor LCP needs each row's predecessor in GLOBAL sort
  * order — the shape a declarative window can only give one reducer.
  * This is the repo's standard two-pass segmented scan instead:
  * `orderBy` range-partitions + locally sorts, pass A collects one
  * bounded carry per partition (row count + last key), the driver
  * stitches seams, pass B walks each partition with its broadcast
  * carry. Results are identical to a sequential walk at any
  * partitioning (spec-pinned). LCPs are computed by the same
  * [[graft.functions.CommonPrefixLen]] kernel the suffix machinery
  * uses (UTF-8 codepoint grain, matching any ANSI oracle's substr).
  */
object PrefixSharing {

  /** For every row: its global sort index over `keyCol` (0-based,
    * ties broken by `idCol`) and the LCP with the previous row in
    * that order (null for the global first row).
    * Output: (id, idx, lcp_prev). */
  def neighborLcp(docs: DataFrame, idCol: String, keyCol: String): DataFrame = {
    import graft.functions.CommonPrefixLen.computeStr
    val spark = docs.sparkSession
    val base = docs.select(col(idCol).cast("long").as("id"), col(keyCol).as("k"))
      .orderBy(col("k"), col("id"))
      .rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass A: one bounded carry per partition (row count, last key)
    val carries = base.mapPartitionsWithIndex { (pi, it) =>
      var last: String = null; var n = 0L
      it.foreach { r => last = r.getString(1); n += 1 }
      Iterator((pi, n, last))
    }.collect().sortBy(_._1)
    val offs = new Array[(Long, String)](carries.length)
    var acc = 0L; var prevLast: String = null
    carries.foreach { case (pi, n, last) =>
      offs(pi) = (acc, prevLast)
      if (n > 0) { acc += n; prevLast = last }
    }
    val bc = spark.sparkContext.broadcast(offs)
    val out = base.mapPartitionsWithIndex { (pi, it) =>
      val (off0, carry) = bc.value(pi)
      var idx = off0; var prev = carry
      it.map { r =>
        val k = r.getString(1)
        val lcp = if (prev == null) null
          else java.lang.Long.valueOf(computeStr(prev, k).toLong)
        prev = k
        val row = Row(r.getLong(0), idx, lcp)
        idx += 1
        row
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("idx", LongType, nullable = false),
      StructField("lcp_prev", LongType, nullable = true))))
  }

  /** Per-row maximum reusable prefix: max(LCP with previous, LCP with
    * next) in global sort order — the all-pairs max, by prefix-order
    * compatibility. Output: (id, idx, reusable). */
  def reusablePrefix(docs: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val nl = neighborLcp(docs, idCol, keyCol)
      .localCheckpoint(eager = false) // probed as both self and successor
    nl.join(
        nl.select((col("idx") - 1).as("idx"), col("lcp_prev").as("lcp_next")),
        Seq("idx"), "left")
      .select(col("id"), col("idx"),
        greatest(coalesce(col("lcp_prev"), lit(0L)),
          coalesce(col("lcp_next"), lit(0L))).as("reusable"))
  }
}
