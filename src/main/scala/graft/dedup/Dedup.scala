package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Deduplication suite for training-data pipelines: exact (hash),
  * n-gram Jaccard (inverted-index pair generation), MinHash+LSH
  * (band-bucket candidate join + exact verify), and SimHash (banded
  * Hamming search).
  *
  * Scale design: nothing is all-pairs. Exact dedup is one hash
  * aggregation; Jaccard pairs come from an inverted-index join on
  * shingles (optionally dropping stop-shingles above a document-
  * frequency cutoff); MinHash compares only band-collision candidates;
  * SimHash compares only band-collision candidates (pigeonhole-exact
  * for Hamming ≤ bands−1). All hashing is md5-derived so any engine can
  * reproduce it bit-for-bit.
  */
object Dedup {

  /** Exact dedup on a key: keeps the row with the minimal (tieCol) per
    * key, annotating group size. One shuffle. */
  def exact(df: DataFrame, keyCol: Column, tieCol: String): DataFrame =
    df.withColumn("__key", keyCol)
      .groupBy(col("__key"))
      .agg(
        min(col(tieCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .withColumnRenamed("__key", "content_key")

  /** Distinct (id, shingle) pairs — the inverted-index input.
    * `maxDocFreq` drops shingles present in more than that many
    * documents (stop-shingle cutoff; 0 = keep all).
    *
    * The document-frequency cutoff is ONE pass over the index: a count
    * window over the shingle partitioning (not a groupBy + semi-join
    * back, which re-derives the tokenize+shingle subtree and pays a
    * second shuffle). The window's hash partitioning on `shingle` is
    * exactly what every downstream consumer (the posting self-join)
    * needs, so the exchange is reused, not repeated. */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String, k: Int,
                   maxDocFreq: Long = 0L): DataFrame = {
    // materialize the token array first: element_at inside the shingle
    // lambda would otherwise re-evaluate split() per referenced element.
    // Widen first: tokenize+shingle is the CPU-dense stage of every
    // dedup pipeline, and a one-file corpus otherwise runs it on a
    // single task per consumer subtree (measured: 4 × 0.5 s sequential
    // single-task scans in the Jaccard plan at sf0.1).
    val sh = graft.core.Widen.widen(df)
      .select(col(idCol).as("doc"),
        TextFunctions.wsTokens(col(textCol)).as("__ws"))
      .select(col("doc"),
        explode(TextFunctions.shingles(col("__ws"), k)).as("shingle"))
    if (maxDocFreq <= 0) sh
    else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))
      sh.withColumn("__df", count(lit(1)).over(w))
        .filter(col("__df") <= maxDocFreq)
        .drop("__df")
    }
  }

  /** Exact n-gram Jaccard near-dup pairs ≥ threshold, via the inverted
    * index: pairs sharing ≥1 shingle → common counts → |A∪B| from
    * per-doc sizes.
    *
    * Plan-shape notes (both alternatives measured WORSE at sf0.1):
    *  - posting-list pair generation (collect_list per shingle +
    *    double explode) hit 29 s vs 1.9 s — exploding a |D|-doc posting
    *    row materializes |D| copies of the |D|-element array, where the
    *    self-join STREAMS the same |D|² pairs through fused
    *    join+filter+partial-agg codegen; collect_list is additionally
    *    non-deterministic in Catalyst, which disables ReuseExchange on
    *    anything above it;
    *  - computing sizes as a per-row `size(shingles(...))` expression
    *    made the frame broadcast-eligible and the broadcast build ran
    *    the whole tokenize+shingle pipeline on one thread (28 s).
    * At scale, bound hot shingles with `maxDocFreq` — a stop-shingle
    * connects documents that merely share boilerplate, and its |D|²
    * lands on one reducer. Output: (da, db, common, na, nb, jaccard). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int, threshold: Double,
                        maxDocFreq: Long = 0L): DataFrame = {
    // one tokenize+shingle(+DF-window) pass serves the size census and
    // BOTH sides of the postings self-join — without the checkpoint each
    // of the three subtrees re-derived it, including the stop-shingle
    // document-frequency window when maxDocFreq > 0 (the standing q37
    // cost: the DF pre-pass re-ran behind every consumer)
    val idx = shingleIndex(df, idCol, textCol, k, maxDocFreq)
      .localCheckpoint(eager = true)
    val sizes = idx.groupBy(col("doc")).agg(count(lit(1)).as("n_shingles"))
    val a = idx.withColumnRenamed("doc", "da")
    val b = idx.withColumnRenamed("doc", "db")
    val common = a.join(b, Seq("shingle")).filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc", "da").withColumnRenamed("n_shingles", "na"), Seq("da"))
      .join(sizes.withColumnRenamed("doc", "db").withColumnRenamed("n_shingles", "nb"), Seq("db"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("da", "db", "common", "na", "nb", "jaccard")
  }

  /** Prefix-filtered exact Jaccard pairs (the SSJoin/PPJoin candidate
    * discipline — Chaudhuri et al. ICDE'06, Xiao et al. WWW'08): under
    * a GLOBAL total order on shingles (document frequency ascending,
    * then shingle — rarest first), any pair with Jaccard ≥ t must share
    * a shingle inside both docs' first n − ⌈t·n⌉ + 1 shingles, so only
    * those PREFIXES are indexed for candidate generation; candidates
    * are then verified exactly on the full index. Output is identical
    * to [[ngramJaccardPairs]] at the same threshold (spec-pinned) —
    * the difference is the candidate volume: the frequent shingles
    * that dominate the postings self-join (the Zipf head q37 can only
    * amputate with the lossy `maxDocFreq` knob) land in the LONG tail
    * of every rarest-first prefix and never generate candidates, while
    * prefix filtering stays EXACT.
    *
    * The threshold is a rational tNum/tDen so the prefix length
    * ⌈t·n⌉ is computed in integer arithmetic — a double `ceil(0.6·n)`
    * rounds 3.0000000000000004 up and silently shortens a valid
    * prefix (a false-negative bug, not a perf knob). The final filter
    * divides in double like the q37 oracle.
    *
    * Scale shape: one shingle pass (pinned — DF census, prefix build
    * and verify all read it), the candidate join touches prefix
    * postings only, verification rides the established cand→postings
    * equi-join.
    *
    * Measured honestly (sf0.1, min of 3): q230 1.60 s vs q37 0.97 s —
    * on THIS corpus 5-gram shingles are nearly all unique (no Zipf
    * head), so the full self-join has nothing hot to blow up on and
    * the DF census + per-doc prefix window are pure overhead. Prefix
    * filtering is the right tool when the shingle distribution has a
    * head the self-join would square (short shingles, boilerplate-
    * heavy corpora) — exactly where q37 must resort to the lossy
    * `maxDocFreq` amputation. */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                         k: Int, tNum: Int, tDen: Int): DataFrame = {
    val idx = shingleIndex(df, idCol, textCol, k)
      .localCheckpoint(eager = true)
    val sizes = idx.groupBy(col("doc")).agg(count(lit(1)).as("n_shingles"))
    val dfreq = idx.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("__df").asc, col("shingle").asc)
    // prefix length n − ⌈t·n⌉ + 1, ⌈t·n⌉ = (tNum·n + tDen − 1) div tDen
    val alpha = floor((col("n_shingles") * tNum + tDen - 1) / tDen).cast("long")
    val prefix = idx.join(dfreq, Seq("shingle"))
      .join(sizes, Seq("doc"))
      .withColumn("__pos", row_number().over(wDoc))
      .filter(col("__pos") <= col("n_shingles") - alpha + 1)
      .select(col("doc"), col("shingle"))
      .localCheckpoint(eager = true) // both sides of the candidate join
    val cand = prefix.withColumnRenamed("doc", "da")
      .join(prefix.withColumnRenamed("doc", "db"), Seq("shingle"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
    val common = cand
      .join(idx.select(col("doc").as("da"), col("shingle")), Seq("da"))
      .join(idx.select(col("doc").as("db"), col("shingle")), Seq("db", "shingle"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc", "da").withColumnRenamed("n_shingles", "na"), Seq("da"))
      .join(sizes.withColumnRenamed("doc", "db").withColumnRenamed("n_shingles", "nb"), Seq("db"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= lit(tNum.toDouble / tDen))
      .select("da", "db", "common", "na", "nb", "jaccard")
  }

  /** Asymmetric containment near-dup pairs: containment(a→b) =
    * |S(a) ∩ S(b)| / |S(a)| — the directional overlap that catches a
    * SMALL document embedded inside a big one (quote pages, article +
    * boilerplate reposts, excerpt farms), which symmetric Jaccard
    * scores low because the union is dominated by the big side (a
    * 100-shingle doc fully inside a 10000-shingle doc has containment
    * 1.0 and Jaccard < 0.01 — invisible to [[ngramJaccardPairs]] at any
    * usable threshold). CCNet/Dolma-style curation dedups on exactly
    * this measure for sub-document duplication.
    *
    * Same execution shape as the Jaccard pairs: ONE shingle(+DF) pass
    * serves the size census and both postings sides (shared-pass
    * discipline), pairs come from the inverted index (never
    * all-pairs), and the aggregate-then-filter order keeps the
    * candidate explosion bounded by shared-shingle mass. A pair
    * survives if EITHER direction clears the threshold; both
    * containments are reported so the consumer can tell "a inside b"
    * from "b inside a". */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       k: Int, threshold: Double,
                       maxDocFreq: Long = 0L): DataFrame = {
    val idx = shingleIndex(df, idCol, textCol, k, maxDocFreq)
      .localCheckpoint(eager = true)
    val sizes = idx.groupBy(col("doc")).agg(count(lit(1)).as("n_shingles"))
    val a = idx.withColumnRenamed("doc", "da")
    val b = idx.withColumnRenamed("doc", "db")
    val common = a.join(b, Seq("shingle")).filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc", "da").withColumnRenamed("n_shingles", "na"), Seq("da"))
      .join(sizes.withColumnRenamed("doc", "db").withColumnRenamed("n_shingles", "nb"), Seq("db"))
      .withColumn("containment_a", col("common").cast("double") / col("na").cast("double"))
      .withColumn("containment_b", col("common").cast("double") / col("nb").cast("double"))
      .filter(greatest(col("containment_a"), col("containment_b")) >= threshold)
      .select("da", "db", "common", "na", "nb", "containment_a", "containment_b")
  }

  /** Edit-distance-verified near-dup pairs: candidates from the shingle
    * inverted index (never all-pairs), then threshold-bounded
    * Levenshtein on the survivors only. Two exact prunes keep the
    * expensive verify off obviously-far pairs:
    *  - a length band — `|len(a) − len(b)| ≤ maxDist` is implied by
    *    `lev ≤ maxDist`, so the gap filter is semantics-free;
    *  - Spark's 3-arg `levenshtein(l, r, threshold)`, which runs the
    *    banded O(n·maxDist) recurrence with early exit and returns −1
    *    above the threshold, instead of the O(n²) full matrix.
    * Character-level edit distance is the verify stage token-set
    * measures (Jaccard, MinHash) can't express: it catches single-char
    * OCR noise / typo recrawls whose shingle sets still overlap, and
    * rejects same-vocabulary reorderings that Jaccard scores high.
    * Output: (da, db, len_a, len_b, dist), dist ≤ maxDist exact. */
  def editDistanceNearDups(df: DataFrame, idCol: String, textCol: String,
                           k: Int, maxDist: Int,
                           maxDocFreq: Long = 0L): DataFrame = {
    // shared-pass discipline: both postings sides derive from the one
    // shingle(+DF-window) pass
    val idx = shingleIndex(df, idCol, textCol, k, maxDocFreq)
      .localCheckpoint(eager = true)
    // pin the pair-distinct's partitioning at an explicit width: the
    // candidate frame is BYTES-small, so AQE's byte-targeted coalesce
    // runs the distinct — and the downstream O(len²) Levenshtein
    // verify that inherits its partitioning — on ONE task (measured
    // 1.8 s of the query's 2.5 s). An explicit numPartitions is the
    // one repartition form AQE never coalesces; defaultParallelism =
    // cores here, executors×cores on a cluster.
    val cand = idx.withColumnRenamed("doc", "da")
      .join(idx.withColumnRenamed("doc", "db"), Seq("shingle"))
      .filter(col("da") < col("db"))
      .select("da", "db")
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("da"), col("db"))
      .distinct()
    val texts = df.select(col(idCol).as("__tid"), col(textCol).as("__ttext"),
      length(col(textCol)).cast("long").as("__tlen"))
    cand
      .join(texts.withColumnRenamed("__tid", "da"), Seq("da"))
      .withColumnsRenamed(Map("__ttext" -> "__ta", "__tlen" -> "len_a"))
      .join(texts.withColumnRenamed("__tid", "db"), Seq("db"))
      .withColumnsRenamed(Map("__ttext" -> "__tb", "__tlen" -> "len_b"))
      .filter(abs(col("len_a") - col("len_b")) <= maxDist)
      .withColumn("dist", levenshtein(col("__ta"), col("__tb"), maxDist))
      .filter(col("dist") >= 0)
      .select("da", "db", "len_a", "len_b", "dist")
  }

  /** md5-derived 28-bit base hash of a string (first 7 hex chars parsed
    * base-16 — reproducible anywhere). */
  def md5Hash28(s: Column): Column =
    conv(substring(md5(s), 1, 7), 16, 10).cast("long")

  /** Affine permutation of the base hash: one md5 per shingle, then
    * `numPerms` cheap universal-hash variants
    * h_p = (a_p·h0 + p) mod (2³¹−1) with a_p = (2654435761·(p+1)) mod
    * (2³¹−1). a_p < 2³¹ and h0 < 2²⁸ keep the product well inside a
    * signed 64-bit, so any engine reproduces it exactly. */
  def permHash(p: Column, h0: Column): Column =
    ((lit(2654435761L) * (p + 1) % 2147483647L) * h0 + p) % 2147483647L

  /** MinHash signatures in WIDE form: one row per doc with columns
    * `m0..m{numPerms−1}`. All permutations evaluate inside ONE hash
    * aggregation over the inverted index — `numPerms` cheap arithmetic
    * variants of the single md5 per shingle, each under its own `min` —
    * instead of exploding the index ×numPerms and shuffling (doc, perm)
    * rows. One shuffle on doc, map-side combined, codegen throughout. */
  def minhashSignaturesWide(idx: DataFrame, numPerms: Int): DataFrame = {
    val mins = (0 until numPerms).map(p =>
      min(permHash(lit(p), col("h0"))).as(s"m$p"))
    idx.select(col("doc"), md5Hash28(col("shingle")).as("h0"))
      .groupBy(col("doc"))
      .agg(mins.head, mins.tail: _*)
  }

  /** LSH band keys from the wide signature: md5 of the '-'-joined
    * signature slice per band, assembled per-row (no aggregation), then
    * unpacked to (doc, band, bkey) rows for the collision self-join. */
  def lshBandKeysWide(sigW: DataFrame, numPerms: Int, rowsPerBand: Int): DataFrame = {
    val nBands = numPerms / rowsPerBand
    val bandStructs = array((0 until nBands).map { b =>
      val slice = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(p => col(s"m$p").cast("string"))
      struct(lit(b).as("band"), md5(concat_ws("-", slice: _*)).as("bkey"))
    }: _*)
    sigW.select(col("doc"), explode(bandStructs).as("bb"))
      .select(col("doc"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  /** MinHash+LSH near-dup pairs: band-collision candidates, verified
    * with exact Jaccard ≥ threshold. Also reports the signature-level
    * estimate (fraction of agreeing permutations), computed as a per-row
    * column comparison of the two wide signatures — no per-permutation
    * join. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int, numPerms: Int, rowsPerBand: Int,
                      threshold: Double): DataFrame = {
    // the shingle index feeds four subtrees (signatures, sizes, both
    // sides of the verify self-join) and the wide signature frame three
    // (bands, both estimate sides); the earlier belief that ReuseExchange
    // would dedupe them did not survive a plan audit (0 reused exchanges
    // — the subtrees differ after projection pushdown), so each pass ran
    // once per consumer. Eager checkpoints run the CPU-dense passes once.
    val idx = shingleIndex(df, idCol, textCol, k).localCheckpoint(eager = true)
    val sigW = minhashSignaturesWide(idx, numPerms).localCheckpoint(eager = true)
    val bands = lshBandKeysWide(sigW, numPerms, rowsPerBand)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("da"), col("y.doc").as("db")).distinct()
    // signature agreement estimate: compare the wide rows column-wise
    val agree = (0 until numPerms)
      .map(p => when(col(s"__a_m$p") === col(s"__b_m$p"), 1).otherwise(0))
      .reduce(_ + _)
    val sigA = sigW.select(col("doc").as("da") +:
      (0 until numPerms).map(p => col(s"m$p").as(s"__a_m$p")): _*)
    val sigB = sigW.select(col("doc").as("db") +:
      (0 until numPerms).map(p => col(s"m$p").as(s"__b_m$p")): _*)
    val est = cand.join(sigA, Seq("da")).join(sigB, Seq("db"))
      .select(col("da"), col("db"),
        (agree.cast("double") / numPerms).as("est_jaccard"))
    // exact verify on the candidate set only
    val sizes = idx.groupBy(col("doc")).agg(count(lit(1)).as("n_shingles"))
    val common = idx.select(col("doc").as("da"), col("shingle"))
      .join(idx.select(col("doc").as("db"), col("shingle")), Seq("shingle"))
      .join(cand, Seq("da", "db"), "left_semi")
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("common"))
    est.join(common, Seq("da", "db"), "left")
      .join(sizes.withColumnRenamed("doc", "da").withColumnRenamed("n_shingles", "na"), Seq("da"))
      .join(sizes.withColumnRenamed("doc", "db").withColumnRenamed("n_shingles", "nb"), Seq("db"))
      .withColumn("jaccard",
        coalesce(col("common"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("common"), lit(0L))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("da", "db", "jaccard", "est_jaccard")
  }

  /** Winnowed rolling-hash fingerprints (Schleimer et al., "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD'03) at token
    * granularity: token k-gram hashes (Horner-combined md5 bases, all
    * integer arithmetic mod 2³¹−1 — any engine reproduces them), then
    * the minimum over every sliding window of `w` consecutive k-grams
    * is kept. Any shared token run of length ≥ w + k − 1 between two
    * documents is guaranteed to surface as a shared fingerprint, at
    * ~1/w the density of the full k-gram set.
    * Output: distinct (doc, fp). One explode + two windows per doc
    * ordering — no all-pairs anything. */
  def winnowedFingerprints(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 3, w: Int = 4): DataFrame = {
    val B = 1000003L
    val M = 2147483647L
    val toks = graft.core.Widen.widen(df)
      .select(col(idCol).as("doc"),
        posexplode(TextFunctions.wsTokens(col(textCol))).as(Seq("i", "tok")))
      .withColumn("h", md5Hash28(col("tok")))
    val order = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("i"))
    // Horner chain over the k leads keeps every intermediate < 2^52
    val kh = (1 until k).foldLeft(col("h")) { (acc, j) =>
      (acc * B + lead(col("h"), j).over(order)) % M
    }
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("i"))
      .rowsBetween(0, w - 1)
    toks
      .withColumn("kh", kh)
      .filter(col("kh").isNotNull) // trailing positions lack a full k-gram
      .withColumn("fp", min(col("kh")).over(win))
      .select(col("doc"), col("fp")).distinct()
  }

  /** [[winnowedFingerprints]] with the window-start POSITION kept:
    * (doc, pos, fp), one row per distinct (doc, pos, fp) — the span
    * variant feeding [[contaminationSpans]]. `pos` is the 0-based
    * token index of the window start; the fingerprinted region it
    * witnesses is tokens [pos, pos + w + k − 2]. */
  def winnowedSpans(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 3, w: Int = 4): DataFrame = {
    val B = 1000003L
    val M = 2147483647L
    val toks = graft.core.Widen.widen(df)
      .select(col(idCol).as("doc"),
        posexplode(TextFunctions.wsTokens(col(textCol))).as(Seq("i", "tok")))
      .withColumn("h", md5Hash28(col("tok")))
    val order = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("i"))
    val kh = (1 until k).foldLeft(col("h")) { (acc, j) =>
      (acc * B + lead(col("h"), j).over(order)) % M
    }
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("i"))
      .rowsBetween(0, w - 1)
    toks
      .withColumn("kh", kh)
      .filter(col("kh").isNotNull)
      .withColumn("fp", min(col("kh")).over(win))
      .select(col("doc"), col("i").as("pos"), col("fp")).distinct()
  }

  /** Span-level contamination localization: where q90's LSH
    * decontamination answers "IS this training doc a near-dup of a
    * protected doc", this answers "WHICH PART leaked" — training docs'
    * winnowed fingerprint positions semi-joined against the protected
    * set's fingerprint VOCABULARY. Per flagged doc: matched window
    * count and the first/last matched token position (the contaminated
    * extent; windows witness tokens [pos, pos + w + k − 2]).
    *
    * Scale shape: the protected fingerprint set is vocabulary-grain
    * (benchmarks are small — broadcastable); the corpus side is one
    * winnowing pass + a semi join, work ∝ corpus fingerprints, never
    * corpus × benchmark. False-positive floor: a 28-bit base hash
    * collides eventually — treat single-window matches as noise and
    * threshold on `n_matched` downstream. */
  def contaminationSpans(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4): DataFrame = {
    val corpusFps = winnowedSpans(corpus, idCol, textCol, k, w)
    val benchFps = winnowedFingerprints(benchmark, idCol, textCol, k, w)
      .select(col("fp")).distinct()
    corpusFps.join(broadcast(benchFps), Seq("fp"), "left_semi")
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_matched"),
        min(col("pos")).as("first_pos"),
        max(col("pos")).as("last_pos"))
  }

  /** Surgical span removal — the repair arm of [[contaminationSpans]]:
    * instead of dropping a flagged training doc wholesale (q90's
    * discipline), excise ONLY the leaked regions and keep the rest.
    * Every matched winnowed window covers tokens
    * [pos, pos + w + k − 2]; a token inside any matched window is
    * removed, the survivors are rejoined single-spaced in order.
    *
    * Output, for FLAGGED docs only: (doc, n_kept, n_removed,
    * clean_text). Unflagged docs need no repair — callers anti-join.
    * Scale: the per-doc token × matched-window join is bounded by the
    * doc's matched windows (small by construction — a mostly-leaked
    * doc should be dropped, not repaired); the rebuild is one ordered
    * per-doc aggregation, the A14 nest discipline. */
  def removeContaminatedSpans(corpus: DataFrame, benchmark: DataFrame,
                              idCol: String, textCol: String,
                              k: Int = 3, w: Int = 4): DataFrame = {
    val span = w + k - 2
    val benchFps = winnowedFingerprints(benchmark, idCol, textCol, k, w)
      .select(col("fp")).distinct()
    // the matched-window set feeds three subtrees and the flagged-doc
    // token explode three more; without the checkpoints each consumer
    // re-ran the winnowing pass / the tokenize (11 source scans at
    // sf0.1). Both frames are bounded by the FLAGGED docs, not the
    // corpus — cheap to pin.
    val matched = winnowedSpans(corpus, idCol, textCol, k, w)
      .join(broadcast(benchFps), Seq("fp"), "left_semi")
      .select(col("doc"), col("pos"))
      .localCheckpoint(eager = true)
    val toks = graft.core.Widen.widen(corpus)
      .select(col(idCol).as("doc"),
        posexplode(TextFunctions.wsTokens(col(textCol))).as(Seq("i", "tok")))
      .join(matched.select(col("doc")).distinct(), Seq("doc"), "left_semi")
      .localCheckpoint(eager = true)
    val covered = toks.select(col("doc"), col("i"))
      .join(matched, Seq("doc"))
      .filter(col("i") >= col("pos") && col("i") <= col("pos") + span)
      .select(col("doc"), col("i")).distinct()
    val kept = toks.join(covered, Seq("doc", "i"), "left_anti")
    val rebuilt = kept.groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("i"), col("tok")))),
          s => s("tok")), " ").as("clean_text"))
    val totals = toks.groupBy(col("doc")).agg(count(lit(1)).as("__n_total"))
    // a fully-covered doc has no kept tokens: left join from totals
    totals.join(rebuilt, Seq("doc"), "left")
      .select(col("doc"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Within-corpus exact duplicate-span removal — the self-dedup
    * counterpart of [[removeContaminatedSpans]], and the n-gram-postings
    * re-expression of suffix-array "ExactSubstr" dedup (Lee et al. 2021,
    * Deduplicating Training Data Makes Language Models Better): any
    * n-token span occurring more than once across the corpus keeps its
    * FIRST occurrence (the total order (id, start)) and every later
    * occurrence's token positions are excised; survivors are rejoined
    * single-spaced in order. A verbatim copy of doc A is erased entirely
    * while A survives intact; a within-doc repeat keeps its first run.
    *
    * Scale shape: the corpus's n-grams shuffle ONCE, keyed by a 128-bit
    * gram fingerprint (two independent xxhash64 seeds — the gram string
    * itself never crosses the wire), into a window that counts and ranks
    * occurrences; the window sort is spillable, so a gram repeated
    * millions of times never buffers a group in memory (the failure mode
    * a groupBy+collect_list formulation would have). Only duplicated,
    * non-canonical occurrences explode into position masks, and the
    * mask-back join is id-keyed at document grain. Fingerprint collisions
    * (~2^-128 per gram pair) can at worst mask a non-duplicate span —
    * the same accepted-risk class as MinHash band collisions.
    *
    * Output per document: (doc, n_tokens, n_removed, clean_text). */
  def selfSpanDedup(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 8): DataFrame = {
    val toks = spanToks(docs, idCol, textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h1"), col("__h2"))
    val masked = spanGrams(toks, n)
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__rn",
        row_number().over(w.orderBy(col("doc"), col("start"))))
      .filter(col("__cnt") > 1 && col("__rn") > 1)
    spanRebuild(toks, masked, n)
  }

  /** Tokenized corpus for the span family: (doc, __ws). */
  private def spanToks(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.core.Widen.widen(docs)
      .select(col(idCol).as("doc"),
        TextFunctions.wsTokens(col(textCol)).as("__ws"))

  /** n-gram occurrences keyed by the 128-bit fingerprint:
    * (doc, start, __h1, __h2). */
  private def spanGrams(toks: DataFrame, n: Int): DataFrame =
    toks
      .select(col("doc"),
        posexplode(TextFunctions.ngrams(col("__ws"), n)).as(Seq("start", "gram")))
      .select(col("doc"), col("start"),
        xxhash64(col("gram")).as("__h1"),
        xxhash64(lit("span2"), col("gram")).as("__h2"))

  /** Shared rebuild tail: explode masked occurrences into position
    * masks, join back at document grain, excise and rejoin. */
  private def spanRebuild(toks: DataFrame, maskedOcc: DataFrame, n: Int): DataFrame = {
    val masks = maskedOcc
      .select(col("doc"),
        explode(sequence(col("start"), col("start") + lit(n - 1))).as("pos"))
      .groupBy(col("doc"))
      .agg(array_sort(collect_set(col("pos"))).as("__mask"))
    toks.join(masks, Seq("doc"), "left")
      .select(col("doc"),
        size(col("__ws")).cast("long").as("n_tokens"),
        coalesce(size(col("__mask")), lit(0)).cast("long").as("n_removed"),
        concat_ws(" ",
          filter(col("__ws"), (_, i) =>
            not(array_contains(
              coalesce(col("__mask"), array().cast("array<int>")), i))))
          .as("clean_text"))
  }

  /** Landed gram-fingerprint index for [[incrementalSpanDedup]]: the
    * distinct 128-bit fingerprints of every n-gram in the corpus —
    * write it to the versioned store once, probe it per batch. */
  def spanGramIndex(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 8): DataFrame =
    spanGrams(spanToks(docs, idCol, textCol), n)
      .select(col("__h1"), col("__h2")).distinct()

  /** Incremental duplicate-span removal — the batch arm of
    * [[selfSpanDedup]], same discipline as [[incrementalNearDups]]:
    * a NEW batch is cleaned against the landed corpus's gram index
    * plus itself, without ever rescanning the corpus. A batch gram
    * occurrence is excised when its fingerprint exists in the landed
    * index (the corpus already owns that span) or when it repeats
    * within the batch and is not the batch-first occurrence.
    *
    * Scale shape: work tracks the BATCH — the index side joins on the
    * same (h1, h2) keys the batch grams already shuffle on for the
    * window, so the landed index is probed with one hash join and the
    * corpus text is never touched. */
  def incrementalSpanDedup(newDocs: DataFrame, index: DataFrame,
                           idCol: String, textCol: String,
                           n: Int = 8): DataFrame = {
    val toks = spanToks(newDocs, idCol, textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h1"), col("__h2"))
    val masked = spanGrams(toks, n)
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__rn",
        row_number().over(w.orderBy(col("doc"), col("start"))))
      .join(index.select(col("__h1"), col("__h2"))
        .withColumn("__landed", lit(true)),
        Seq("__h1", "__h2"), "left")
      .filter(col("__landed") || (col("__cnt") > 1 && col("__rn") > 1))
    spanRebuild(toks, masked, n)
  }

  /** Snapshot diff — the ingest-ops delta between two corpus versions:
    * one full outer join on the document id comparing content
    * fingerprints. Output: (id, status ∈ added|removed|changed|
    * unchanged, plus both fingerprints for audit). The shuffle is the
    * id join only; fingerprints are whatever content hash the caller
    * trusts (md5 of the canonical bytes, the [[exact]] convention).
    * The status column feeds incremental work downstream: re-run
    * curation on added ∪ changed, tombstone removed — never rescan the
    * unchanged mass. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, idCol: String,
                   fpCol: String): DataFrame = {
    val a = v1.select(col(idCol).as("__id"), col(fpCol).as("fp_v1"))
    val b = v2.select(col(idCol).as("__id"), col(fpCol).as("fp_v2"))
    a.join(b, Seq("__id"), "full_outer")
      .withColumn("status",
        when(col("fp_v1").isNull, lit("added"))
          .when(col("fp_v2").isNull, lit("removed"))
          .when(col("fp_v1") === col("fp_v2"), lit("unchanged"))
          .otherwise(lit("changed")))
      .withColumnRenamed("__id", idCol)
  }

  /** 60-bit SimHash per document from whitespace-token term frequencies:
    * bit b of md5(token) votes ±tf; the sign of the vote sum sets bit b.
    * Output: (doc, simhash). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = graft.core.Widen.widen(df)
      .select(col(idCol).as("doc"),
        explode(TextFunctions.wsTokens(col(textCol))).as("tok"))
      .groupBy(col("doc"), col("tok")).agg(count(lit(1)).as("tf"))
      .withColumn("hex", md5(col("tok")))
    // 60 per-bit vote sums as columns of ONE aggregation instead of a
    // 60-way row explode: the bit extraction stays inside whole-stage
    // codegen and the only shuffle carries 5k doc groups × 60 ints with
    // map-side partial aggregation — not |docs|·|tokens|·60 rows
    val votes = (0 until 60).map { b =>
      val nib = instr(lit("0123456789abcdef"),
        substring(col("hex"), b / 4 + 1, 1)) - 1
      val bit = shiftright(nib, b % 4).bitwiseAND(lit(1))
      sum(col("tf") * (bit * lit(2) - lit(1))).as(s"__s$b")
    }
    val hash = (0 until 60).map { b =>
      when(col(s"__s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    tf.groupBy(col("doc"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc"), hash.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming ≤ maxHamming, found via
    * `numBands` 15-bit band collisions. Exact (pigeonhole) as long as
    * maxHamming < numBands. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, numBands: Int = 4): DataFrame = {
    require(maxHamming < numBands, "banded search is only exact for hamming < bands")
    // both sides of the band self-join derive from the signature pass —
    // checkpoint it so the tokenize+hash work runs once
    val sh = simhash(df, idCol, textCol).localCheckpoint(eager = true)
    val width = 60 / numBands
    val banded = sh.select(col("doc"), col("simhash"),
      explode(sequence(lit(0), lit(numBands - 1))).as("band"))
      .withColumn("bkey", expr(s"(simhash >> CAST(band * $width AS INT)) % ${1L << width}"))
    // hamming-filter BEFORE distinct: band buckets can collide heavily
    // (skewed corpora), and distinct-ing tens of millions of candidate
    // pairs is the bottleneck — filtered pairs are few, so the distinct
    // shuffle stays tiny.
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("da"), col("y.doc").as("db"),
        expr("CAST(bit_count(x.simhash ^ y.simhash) AS INT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ------------------------------------------------------------------
  // Incremental near-dup: process-once (§2.10) × MinHash LSH
  // ------------------------------------------------------------------

  /** The landed dedup index for a corpus: the shingle inverted index
    * and the LSH band-bucket table, written ONCE per corpus generation.
    * At scale both land as bucketed tables (bands by (band, bkey),
    * index by shingle) so incremental probes partition-prune. */
  final case class DedupIndex(idx: DataFrame, bands: DataFrame)

  def buildIndex(df: DataFrame, idCol: String, textCol: String, k: Int,
                 numPerms: Int, rowsPerBand: Int): DedupIndex = {
    // the tokenize+shingle pass is the CPU-dense stage and BOTH index
    // faces (the shingle postings and the band buckets) derive from it;
    // in production the index is a persisted table, so materializing it
    // once here mirrors the design instead of re-deriving the pass per
    // consumer subtree (measured in q88: 4 landed tokenize passes → 1)
    val idx = shingleIndex(df, idCol, textCol, k).localCheckpoint(eager = true)
    DedupIndex(idx,
      lshBandKeysWide(minhashSignaturesWide(idx, numPerms), numPerms, rowsPerBand))
  }

  /** Near-dups of a NEW batch against an already-landed corpus without
    * touching corpus-side signatures: the batch computes its own bands,
    * probes the stored bucket table for collision candidates (plus
    * batch-internal collisions), and exact-verifies ONLY candidate
    * pairs — work scales with the batch and its collisions, never with
    * the corpus. Corpus-internal pairs are deliberately NOT re-reported
    * (they were found when their docs were new — process-once).
    *
    * Returns (da, db, jaccard): `da` always a new doc; `db` a corpus
    * doc, or a new doc when the pair is batch-internal.
    *
    * PRECONDITION: doc ids must be globally unique across the corpus
    * and every batch (e.g. content hashes or a global sequence). A
    * batch doc reusing a corpus id would be dropped from cross pairs
    * by the `x.doc =!= y.doc` guard, and the union index below would
    * merge both docs' shingles, inflating jaccard for surviving
    * pairs. Callers minting per-batch id sequences must offset them. */
  def incrementalNearDups(newDocs: DataFrame, corpus: DedupIndex,
                          idCol: String, textCol: String, k: Int,
                          numPerms: Int, rowsPerBand: Int,
                          threshold: Double): DataFrame = {
    // batch-side tokenize/minhash and the candidate set each feed 2-3
    // consumer subtrees below; eager checkpoints make every pass run
    // once (the frames are batch-sized by design — that is the point
    // of the incremental path), instead of once per subtree (measured:
    // 6 heavy 32-task stages → 3 at sf0.1)
    val idxNew = shingleIndex(newDocs, idCol, textCol, k).localCheckpoint(eager = true)
    val bandsNew = lshBandKeysWide(
      minhashSignaturesWide(idxNew, numPerms), numPerms, rowsPerBand)
      .localCheckpoint(eager = true)
    val candCorpus = bandsNew.as("x").join(corpus.bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc") =!= col("y.doc"))
      .select(col("x.doc").as("da"), col("y.doc").as("db"))
    val candBatch = bandsNew.as("x").join(bandsNew.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("da"), col("y.doc").as("db"))
    val cand = candCorpus.unionByName(candBatch).distinct()
      .localCheckpoint(eager = true)
    // exact verify over the union index, restricted to involved docs
    val idxAll = idxNew.unionByName(
      corpus.idx.join(cand.select(col("db").as("doc")).distinct(), Seq("doc"), "left_semi"))
      .localCheckpoint(eager = true)
    val sizes = idxAll.groupBy(col("doc")).agg(count(lit(1)).as("n_shingles"))
    val common = idxAll.select(col("doc").as("da"), col("shingle"))
      .join(idxAll.select(col("doc").as("db"), col("shingle")), Seq("shingle"))
      .join(cand, Seq("da", "db"), "left_semi")
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("common"))
    cand.join(common, Seq("da", "db"), "left")
      .join(sizes.withColumnRenamed("doc", "da")
        .withColumnRenamed("n_shingles", "na"), Seq("da"))
      .join(sizes.withColumnRenamed("doc", "db")
        .withColumnRenamed("n_shingles", "nb"), Seq("db"))
      .withColumn("jaccard",
        coalesce(col("common"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("common"), lit(0L))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("da", "db", "jaccard")
  }

  /** Benchmark decontamination: drop training documents that
    * near-duplicate ANY document of a protected (eval) corpus — the
    * incremental probe with the match set removed instead of reported.
    * The protected index is built once ([[buildIndex]]); cost scales
    * with the training batch and its collisions. Batch-internal pairs
    * are irrelevant here, so only eval-side collisions are probed. */
  def decontaminate(train: DataFrame, protectedIdx: DedupIndex,
                    idCol: String, textCol: String, k: Int,
                    numPerms: Int, rowsPerBand: Int,
                    threshold: Double): DataFrame = {
    // same shared-pass discipline as incrementalNearDups: the train-side
    // shingle index feeds three subtrees (signatures, size census,
    // verify join) and the candidate set / pruned protected index two
    // each — eager checkpoints run each derivation once
    val idxNew = shingleIndex(train, idCol, textCol, k).localCheckpoint(eager = true)
    val bandsNew = lshBandKeysWide(
      minhashSignaturesWide(idxNew, numPerms), numPerms, rowsPerBand)
    val cand = bandsNew.as("x").join(protectedIdx.bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc").as("da"), col("y.doc").as("db")).distinct()
      .localCheckpoint(eager = true)
    val idxEval = protectedIdx.idx.join(
      cand.select(col("db").as("doc")).distinct(), Seq("doc"), "left_semi")
      .localCheckpoint(eager = true)
    val sizesNew = idxNew.groupBy(col("doc")).agg(count(lit(1)).as("na"))
    val sizesEval = idxEval.groupBy(col("doc")).agg(count(lit(1)).as("nb"))
    val common = idxNew.select(col("doc").as("da"), col("shingle"))
      .join(idxEval.select(col("doc").as("db"), col("shingle")), Seq("shingle"))
      .join(cand, Seq("da", "db"), "left_semi")
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("common"))
    val contaminated = cand.join(common, Seq("da", "db"), "left")
      .join(sizesNew.withColumnRenamed("doc", "da"), Seq("da"))
      .join(sizesEval.withColumnRenamed("doc", "db"), Seq("db"))
      .filter(coalesce(col("common"), lit(0L)).cast("double") /
        (col("na") + col("nb") - coalesce(col("common"), lit(0L))).cast("double")
        >= threshold)
      .select(col("da").as(idCol)).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Cross-split contamination audit: the eval-hygiene matrix a
    * train/val/test partition needs BEFORE anyone trusts a held-out
    * number. Near-dup pairs ([[minhashLshPairs]], exact-Jaccard
    * verified) are labelled with each endpoint's hash-split membership
    * ([[graft.operators.Splits.splitExpr]] — id-pure, applied inline,
    * no join back to an assignment table) and rolled up per unordered
    * split pair: same-split rows are ordinary redundancy, cross-split
    * rows are leakage. `mean_est` reconstructs the integer MinHash
    * agreement count from the signature estimate (exact: the estimate
    * is agreements/numPerms), so the mean is one division over exact
    * integer sums — order-independent. */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
                   splits: Seq[(String, Double)],
                   k: Int, numPerms: Int, rowsPerBand: Int,
                   threshold: Double, salt: String = "split"): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, k, numPerms, rowsPerBand, threshold)
    val sa = graft.operators.Splits.splitExpr(col("da"), splits, salt)
    val sb = graft.operators.Splits.splitExpr(col("db"), splits, salt)
    pairs
      .select(
        least(sa, sb).as("split_a"),
        greatest(sa, sb).as("split_b"),
        col("jaccard"),
        round(col("est_jaccard") * numPerms).cast("long").as("__agree"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(
        count(lit(1)).as("n_pairs"),
        min(col("jaccard")).as("min_jaccard"),
        max(col("jaccard")).as("max_jaccard"),
        (sum(col("__agree")).cast("double") /
          (lit(numPerms).cast("double") * count(lit(1)))).as("mean_est"))
  }

  /** LSH band planning (the datasketch `optimal_param` table): for a
    * permutation budget and a set of target Jaccard thresholds, score
    * every (bands, rowsPerBand) factorization by its S-curve error —
    * false-positive area below the threshold (∫₀ᵗ P(s) ds) plus
    * false-negative area above it (∫ₜ¹ 1−P(s) ds), P(s) = 1−(1−sʳ)ᵇ,
    * on a fixed 1/100 grid. Each grid probability is e9-FLOORED before
    * summation, so the areas are exact integer sums (order-independent,
    * engine-replayable) and the per-threshold ranking (`rn`, cost then
    * fewer bands) is deterministic. This is how the 16-perm 4×4
    * defaults of [[minhashLshPairs]] are justified — and re-derived for
    * any other budget. */
  def lshPlan(spark: org.apache.spark.sql.SparkSession, nPerms: Int,
              thresholdsPct: Seq[Int]): DataFrame = {
    import spark.implicits._
    require(nPerms > 0 && thresholdsPct.nonEmpty)
    val cfgs = (1 to nPerms).filter(nPerms % _ == 0).map(b => (b, nPerms / b))
      .toDF("b", "r")
    val p = cfgs.crossJoin(thresholdsPct.toDF("t_pct"))
      .select(col("t_pct"), col("b"), col("r"),
        explode(sequence(lit(1), lit(99))).as("i"))
      .withColumn("p_e9", floor(
        (lit(1.0) - pow(lit(1.0) - pow(col("i") / lit(100.0),
          col("r").cast("double")), col("b").cast("double"))) * lit(1000000000.0)))
    p.groupBy(col("t_pct"), col("b"), col("r"))
      .agg(
        expr("sum(CASE WHEN i < t_pct THEN p_e9 ELSE 0 END) div 100").as("fp_e9"),
        expr("sum(CASE WHEN i >= t_pct THEN 1000000000 - p_e9 ELSE 0 END) div 100")
          .as("fn_e9"))
      .withColumn("cost_e9", col("fp_e9") + col("fn_e9"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("t_pct")).orderBy(col("cost_e9"), col("b"))).cast("long"))
  }
}
