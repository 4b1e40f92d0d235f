package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed suffix-array construction by prefix doubling
  * (Manber–Myers 1990; the sort-based distributed formulation of
  * Flick & Aluru, SC'15) — the index structure behind exact
  * substring-level dedup at corpus scale (Lee et al. 2021 build one
  * over the whole training set): rank every suffix of every document
  * in global lexicographic order.
  *
  * Round k knows each suffix's rank among prefixes of length 2^k; one
  * self-join on (doc, pos + 2^k) pairs that rank with the successor's,
  * and re-ranking the pairs yields ranks for length 2^(k+1) —
  * log(maxLen) rounds, each a bounded number of shuffles, no
  * character ever compared twice. Re-ranking sorts the DISTINCT pair
  * set and `zipWithIndex`es it (a distributed sort + one count pass —
  * never a single-reducer window); suffixes past the end rank -1, so
  * a prefix-equal shorter suffix sorts first, exactly like string
  * comparison.
  *
  * Rounds stop when every remaining tie is a genuinely identical
  * suffix (distinct-rank count stops growing) or the doubling passes
  * maxLen. Per-round eager checkpoints + fresh LogicalRDDs keep both
  * the lineage and the join-stats BigInts flat (the BradleyTerry
  * lesson).
  */
object SuffixArray {

  /** @param docs     (idCol, textCol)
    * @param maxChars suffixes are taken over the first `maxChars`
    *                 chars of each doc (the windowed-SA bound; Inf
    *                 semantics = pass the max doc length)
    * @return (idCol, pos, rank): 1-based pos, dense global rank —
    *         identical suffix STRINGS share a rank. */
  /** Seed width: round 0 ranks suffixes by their first `SeedW`-char
    * prefix directly (one string dense-rank), entering the doubling at
    * step = 32 instead of 1 — five fewer rounds. UTF-8 binary string
    * order equals per-char order, so the seed ranks are exactly the
    * step-32 ranks. Measured at sf0.1: SeedW 1 → 4.2 s, 8 → 2.4 s,
    * 32 → 1.5 s, 64 → 1.8 s (wider seeds trade doubling rounds for
    * seed-sort bytes; 32 is the knee on 200-char windows). */
  private val SeedW = 32

  def ranks(docs: DataFrame, idCol: String, textCol: String,
            maxChars: Int): DataFrame = {
    val spark = docs.sparkSession
    val t = substring(col(textCol), 1, maxChars)
    val pos = docs
      .select(col(idCol).as("doc"), t.as("__t"))
      .filter(length(col("__t")) >= 1)
      .select(col("doc"), col("__t"),
        explode(sequence(lit(1), length(col("__t")))).as("posI"))
      .select(col("doc"), col("posI").cast("long").as("pos"),
        expr(s"substring(__t, posI, $SeedW)").as("__k1"))
    val total = pos.count()
    if (total == 0) // empty corpus: empty index (max(rank) below is null)
      return pos.select(col("doc").as(idCol), col("pos"),
        lit(0L).as("rank"))

    // round 0: rank by the SeedW-char prefix
    var ranked = withDenseRank(
      pos.select(col("doc"), col("pos"), col("__k1"), lit("").as("__k2")),
      spark).select(col("doc"), col("pos"), col("rank"))
    ranked = freshCheckpoint(ranked)
    // dense ranks start at 1, so max(rank) IS the distinct-rank count —
    // a partial-agg scan of the pinned RDD, not a countDistinct shuffle
    var nRanks = ranked.agg(max(col("rank"))).collect()(0).getLong(0)
    var step = SeedW.toLong
    while (nRanks < total && step < maxChars) {
      val succ = ranked.select(col("doc"), (col("pos") - step).as("pos"),
        col("rank").as("__r2"))
      val paired = ranked
        .join(succ, Seq("doc", "pos"), "left")
        .select(col("doc"), col("pos"), col("rank").as("__k1"),
          coalesce(col("__r2"), lit(-1L)).as("__k2"))
      ranked = withDenseRank(paired, spark)
        .select(col("doc"), col("pos"), col("rank"))
      ranked = freshCheckpoint(ranked)
      val n = ranked.agg(max(col("rank"))).collect()(0).getLong(0)
      if (n == nRanks) nRanks = total // no progress: remaining ties are real
      else nRanks = n
      step *= 2
    }
    ranked.select(col("doc").as(idCol), col("pos"), col("rank"))
  }

  /** Per-suffix REPEAT lengths via LCP over the suffix array — the
    * operation the index exists for (Lee et al. 2021's repeated-
    * substring mining): for every suffix, the length of the longest
    * prefix it shares with ANY other suffix in the corpus sample. A
    * substring is repeated iff it is a common prefix of two suffixes
    * that are ADJACENT in suffix-array order, so each suffix's repeat
    * length is the max of its LCPs with its two rank-order neighbors
    * — one adjacency pass, never all pairs.
    *
    * Distributed shape: the global adjacency comes from the same
    * range-sort + zipWithIndex discipline as [[withDenseRank]] (no
    * single-reducer window), and the LCPs run through the codegen
    * [[graft.functions.CommonPrefixLen]] kernel. Suffix STRINGS cross
    * the wire here — bounded per row by `maxChars` (the windowed-SA
    * contract), the same byte class the construction's seed pass
    * ships; identical suffixes share a dense rank, sort adjacent, and
    * get their full length as LCP automatically.
    *
    * Versus the fixed-k-gram span dedup (`dedup/Dedup.selfSpanDedup`,
    * q138): a k-gram pass only witnesses repeats of EXACTLY length k
    * (longer repeats appear as runs of overlapping grams); the LCP
    * pass returns each position's exact maximal repeat length in one
    * adjacency scan, which is what span-removal thresholds actually
    * want. SuffixArraySpec pins both claims on planted fixtures.
    *
    * @return (idCol, pos, rep) — rep = 0 when the suffix shares no
    *         nonempty prefix with any neighbor */
  /** `ranksOf`: a precomputed [[ranks]] frame over the SAME
    * (docs, maxChars) — the landed-SA composition seam (q212 lands
    * the ranks, q216/q221 probe them instead of re-running the
    * doubling; the [[graft.core.Landed]] discipline). None = build. */
  def repeatLengths(docs: DataFrame, idCol: String, textCol: String,
                    maxChars: Int,
                    ranksOf: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.CommonPrefixLen.register(spark)
    val r = ranksOf.getOrElse(ranks(docs, idCol, textCol, maxChars))
    val suf = r.join(
        docs.select(col(idCol).as("doc"),
          substring(col(textCol), 1, maxChars).as("__t")),
        r(idCol) === col("doc"))
      .select(col("doc"), col("pos"), col("rank"),
        expr("substring(__t, CAST(pos AS INT))").as("__suf"))
      // two consumers (the adjacency sort and the final rep join-back)
      .localCheckpoint(eager = false)
    val ordered = suf.orderBy(col("rank"), col("doc"), col("pos"))
    val idxRdd = ordered.rdd.zipWithIndex()
      .map { case (row, i) => Row.fromSeq(row.toSeq :+ i) }
    val withIdx = spark.createDataFrame(idxRdd,
      StructType(ordered.schema.fields :+
        StructField("__idx", LongType, nullable = false)))
    val nxt = withIdx.select((col("__idx") - 1).as("__idx"),
      col("doc").as("__doc2"), col("pos").as("__pos2"),
      col("__suf").as("__suf2"))
    val pairs = withIdx.join(nxt, Seq("__idx"))
      .select(col("doc"), col("pos"), col("__doc2"), col("__pos2"),
        call_function("common_prefix_len", col("__suf"), col("__suf2"))
          .cast("long").as("__lcp"))
      .localCheckpoint(eager = false) // feeds both sides of the union
    val rep = pairs.select(col("doc"), col("pos"), col("__lcp"))
      .unionByName(pairs.select(col("__doc2").as("doc"),
        col("__pos2").as("pos"), col("__lcp")))
      .groupBy(col("doc"), col("pos"))
      .agg(max(col("__lcp")).as("rep"))
    suf.select(col("doc"), col("pos"))
      .join(rep, Seq("doc", "pos"), "left")
      .select(col("doc").as(idCol), col("pos"),
        coalesce(col("rep"), lit(0L)).as("rep"))
  }

  /** Shared-prefix RUNS over the suffix order — the grouping step of
    * exact-substring dedup: consecutive suffixes whose adjacent LCPs
    * all reach `minLen` share (by LCP prefix-transitivity) one
    * `minLen`-char prefix, so each maximal such run is one group of
    * duplicate-span occurrences. Returns every suffix with its LCP to
    * the predecessor, its boundary flag (LCP < minLen), and a global
    * run id (the running boundary count).
    *
    * The run id is a data-dependent GLOBAL cumulative sum — the one
    * shape a declarative window can only compute on a single reducer.
    * This is the classic two-pass distributed segmented scan instead
    * (the same cost class as the builder's zipWithIndex): range-sort
    * the suffixes, pass A collects one bounded carry per PARTITION
    * (first/last suffix + internal boundary count), the driver stitches
    * partition seams and prefix-sums the offsets, pass B re-walks each
    * partition with its broadcast carry. LCPs at seams use the
    * previous partition's last suffix, so results are identical to a
    * sequential walk at any partitioning (spec-pinned).
    *
    * @return (doc, pos, prev_lcp (null for the global first suffix),
    *         boundary, run_id) — run_id is 1-based */
  def prefixRuns(docs: DataFrame, idCol: String, textCol: String,
                 maxChars: Int, minLen: Int,
                 ranksOf: Option[DataFrame] = None): DataFrame = {
    import graft.functions.CommonPrefixLen.computeStr
    val spark = docs.sparkSession
    val r = ranksOf.getOrElse(ranks(docs, idCol, textCol, maxChars))
    val suf = r.join(
        docs.select(col(idCol).as("doc"),
          substring(col(textCol), 1, maxChars).as("__t")),
        r(idCol) === col("doc"))
      .select(col("doc"), col("pos"), col("rank"),
        expr("substring(__t, CAST(pos AS INT))").as("__suf"))
    val base = suf.orderBy(col("rank"), col("doc"), col("pos"))
      .select(col("doc"), col("pos"), col("__suf"))
      .rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass A: bounded per-partition carries (first/last suffix string,
    // boundary count among rows 2..n) — one row per partition
    val carries = base.mapPartitionsWithIndex { (pi, it) =>
      var first: String = null; var prev: String = null
      var nb = 0L; var n = 0L
      it.foreach { row =>
        val s = row.getString(2)
        if (first == null) first = s
        else if (computeStr(prev, s) < minLen) nb += 1
        prev = s; n += 1
      }
      Iterator((pi, first, prev, nb, n))
    }.collect().sortBy(_._1)
    // driver stitch: boundary status of each partition's first row +
    // the running boundary count entering each partition
    val offs = new Array[(Long, String)](carries.length)
    var prevLast: String = null
    var acc = 0L
    carries.foreach { case (pi, first, last, nb, n) =>
      offs(pi) = (acc, prevLast)
      if (n > 0) {
        val firstBoundary =
          prevLast == null || computeStr(prevLast, first) < minLen
        acc += nb + (if (firstBoundary) 1L else 0L)
        prevLast = last
      }
    }
    val bc = spark.sparkContext.broadcast(offs)
    val out = base.mapPartitionsWithIndex { (pi, it) =>
      val (off0, carry) = bc.value(pi)
      var runId = off0
      var prev = carry
      it.map { row =>
        val s = row.getString(2)
        val lcp = if (prev == null) -1 else computeStr(prev, s)
        val boundary = lcp < minLen
        if (boundary) runId += 1
        prev = s
        Row(row.get(0), row.getLong(1),
          if (lcp < 0) null else lcp.toLong, boundary, runId)
      }
    }
    val docType = suf.schema("doc").dataType
    spark.createDataFrame(out, StructType(Seq(
      StructField("doc", docType, nullable = true),
      StructField("pos", LongType, nullable = false),
      StructField("prev_lcp", LongType, nullable = true),
      StructField("boundary", org.apache.spark.sql.types.BooleanType,
        nullable = false),
      StructField("run_id", LongType, nullable = false))))
  }

  /** Landed-index form of [[ranks]]: (doc, pos, rank, suffix) — the
    * rank table carrying each suffix's (windowed, ≤ `maxChars`-char)
    * string, which is what makes the index EXTENDABLE: a later batch
    * rank-inserts against the strings without re-running the doubling
    * (the byte class is the same one [[repeatLengths]] already ships). */
  def index(docs: DataFrame, idCol: String, textCol: String,
            maxChars: Int): DataFrame = {
    val r = ranks(docs, idCol, textCol, maxChars)
    r.join(
        docs.select(col(idCol).as("doc"),
          substring(col(textCol), 1, maxChars).as("__t")),
        r(idCol) === col("doc"))
      .select(col("doc").as(idCol), col("pos"), col("rank"),
        expr("substring(__t, CAST(pos AS INT))").as("suffix"))
  }

  /** Incremental suffix-array maintenance — the landed-index arm the
    * rest of the repo's indexes already have (LSH bands, shingle
    * grams, chunk fingerprints): merge a LANDED index ([[index]]'s
    * (doc, pos, rank, suffix)) with a batch of new docs in ONE linear
    * merge pass instead of replaying the seed sort + doubling rounds
    * over the whole corpus.
    *
    * Rank arithmetic (dense, string-keyed): for a new-only string s,
    * merged_rank(s) = (#landed distinct < s) + (#new-only ≤ s); for a
    * landed string with rank r, merged_rank = r + (#new-only < it).
    * Both are prefix quantities over the string-ordered union of the
    * landed DISTINCT strings and the new-only strings, so one
    * range-sort + the [[prefixRuns]] two-pass segmented scan (bounded
    * per-partition carries, driver stitch, broadcast-carry re-walk)
    * produces every merged rank — merge ≡ rebuild exactly, which the
    * q252 oracle pins by dense-ranking the union from raw text.
    *
    * Scale: the landed side contributes its distinct-string set once
    * per merge (a linear pass over the stored index — the LSM-merge
    * cost class), the batch contributes its suffixes; no doubling, no
    * re-ranking. At a real deployment the landed index is stored
    * rank-bucketed so this sort is a bucketed zip.
    *
    * @return (idCol, pos, rank, is_new) over landed ∪ new suffixes */
  def extendRanks(landedIdx: DataFrame, newDocs: DataFrame, idCol: String,
                  textCol: String, maxChars: Int): DataFrame = {
    val spark = landedIdx.sparkSession
    val landed = landedIdx.select(col("pos"), col("rank"), col("suffix"),
      col(idCol).as("doc"))
    val landedDistinct = landed.select(col("rank"), col("suffix")).distinct()
    val t = substring(col(textCol), 1, maxChars)
    val newSuf = newDocs
      .select(col(idCol).as("doc"), t.as("__t"))
      .filter(length(col("__t")) >= 1)
      .select(col("doc"), col("__t"),
        explode(sequence(lit(1), length(col("__t")))).as("posI"))
      .select(col("doc"), col("posI").cast("long").as("pos"),
        expr("substring(__t, posI)").as("suffix"))
      .localCheckpoint(eager = false) // feeds the distinct + the join-back
    val newOnly = newSuf.select(col("suffix")).distinct()
      .join(landedDistinct.select(col("suffix")), Seq("suffix"), "left_anti")
    // string-ordered union; strings are unique across and within classes
    val union = landedDistinct
      .select(col("suffix"), col("rank"), lit(true).as("__landed"))
      .unionByName(newOnly.select(col("suffix"), lit(-1L).as("rank"),
        lit(false).as("__landed")))
    val base = union.orderBy(col("suffix"))
      .rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass A: per-partition carries (last landed rank, #new-only rows)
    val carries = base.mapPartitionsWithIndex { (pi, it) =>
      var lastLanded = -1L; var nNew = 0L
      it.foreach { row =>
        if (row.getBoolean(2)) lastLanded = row.getLong(1) else nNew += 1
      }
      Iterator((pi, lastLanded, nNew))
    }.collect().sortBy(_._1)
    // driver stitch: running (last landed rank, new-only count) at entry
    val offs = new Array[(Long, Long)](carries.length)
    var accL = 0L; var accN = 0L
    carries.foreach { case (pi, lastLanded, nNew) =>
      offs(pi) = (accL, accN)
      if (lastLanded >= 0) accL = lastLanded
      accN += nNew
    }
    val bc = spark.sparkContext.broadcast(offs)
    val rankRows = base.mapPartitionsWithIndex { (pi, it) =>
      var (lastLanded, nNew) = bc.value(pi)
      it.map { row =>
        val merged =
          if (row.getBoolean(2)) { // landed rank r + #new-only before it
            lastLanded = row.getLong(1)
            lastLanded + nNew
          } else { // (#landed <= s is lastLanded, dense) + (#new-only <= s)
            nNew += 1
            lastLanded + nNew
          }
        Row(row.getString(0), merged)
      }
    }
    val rankMap = spark.createDataFrame(rankRows, StructType(Seq(
        StructField("suffix", org.apache.spark.sql.types.StringType,
          nullable = false),
        StructField("__mr", LongType, nullable = false))))
      .localCheckpoint(eager = false) // probed by both occurrence classes
    landed.select(col("doc"), col("pos"), col("suffix"),
        lit(false).as("is_new"))
      .unionByName(newSuf.select(col("doc"), col("pos"), col("suffix"),
        lit(true).as("is_new")))
      .join(rankMap, Seq("suffix"))
      .select(col("doc").as(idCol), col("pos"), col("__mr").as("rank"),
        col("is_new"))
  }

  /** The compaction rule (the reference's rebuild-over-extend
    * threshold, `R/get-cloud-files.R:178-184` / `inst/conf.yml:43-45`
    * — merge small deltas, rebuild when the delta rivals the base):
    * extend the landed index when the batch's suffix mass is below
    * `rebuildFraction` of the landed mass, otherwise rebuild from all
    * docs. Both paths produce IDENTICAL ranks (merge ≡ rebuild), so
    * the switch is a cost policy, never a semantics change. */
  def extendOrRebuild(landedIdx: DataFrame, landedDocs: DataFrame,
                      newDocs: DataFrame, idCol: String, textCol: String,
                      maxChars: Int, rebuildFraction: Double = 0.5): DataFrame = {
    val t = substring(col(textCol), 1, maxChars)
    def mass(docs: DataFrame): Long =
      docs.agg(sum(length(t)).cast("long")).collect()(0) match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    if (mass(newDocs) <= rebuildFraction * mass(landedDocs))
      extendRanks(landedIdx, newDocs, idCol, textCol, maxChars)
    else {
      val all = landedDocs.select(col(idCol), col(textCol))
        .unionByName(newDocs.select(col(idCol), col(textCol)))
      // rebuilt ranks; tag batch rows for parity with the extend arm
      ranks(all, idCol, textCol, maxChars)
        .join(newDocs.select(col(idCol).as("__nid")),
          col(idCol) === col("__nid"), "left")
        .select(col(idCol), col("pos"), col("rank"),
          col("__nid").isNotNull.as("is_new"))
    }
  }

  /** Dense rank of (__k1, __k2) without a single-reducer window: the
    * DISTINCT key set is range-sorted and zipWithIndex'd (per-partition
    * offsets from one count pass), then joined back. */
  private def withDenseRank(df: DataFrame,
                            spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val keys = df.select(col("__k1"), col("__k2")).distinct()
    val sortedRdd = keys.orderBy(col("__k1"), col("__k2")).rdd
      .zipWithIndex()
      .map { case (r, i) => Row(r.get(0), r.get(1), i + 1L) }
    val schema = StructType(keys.schema.fields :+
      StructField("rank", LongType, nullable = false))
    val rankMap = spark.createDataFrame(sortedRdd, schema)
    df.join(rankMap, Seq("__k1", "__k2"))
  }

  private def freshCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(eager = true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
