package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.dedup.{Dedup, NgramDecon, Novelty}

/** Near-duplicate detection suite over `documents`: exact hash dedup,
  * inverted-index n-gram Jaccard, MinHash+LSH with exact verification,
  * and banded SimHash. Hashing is md5-derived throughout, so every
  * pipeline is replicated 1:1 in the SQL oracle.
  */
object DedupQueries {

  private val wsSql = "string_split_regex(trim(text), '\\s+')"
  /** Distinct word 5-shingles per doc (SQL mirror of
    * TextFunctions.shingles(k=5)). */
  private val shingleSql =
    s"""sh AS (
       |  SELECT DISTINCT doc_id AS doc,
       |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS shingle
       |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
       |    UNNEST(generate_series(1, greatest(len(ws) - 4, 0))) AS u(i)),
       |sizes AS (SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc)""".stripMargin

  /** Shared oracle block: q57's near-dup clusters (Jaccard ≥ 0.2 pairs
    * → recursive-CTE connected components) plus per-doc token counts —
    * the base both the election (q118) and the preference-pair mining
    * (q162) replay. Requires `WITH RECURSIVE`. */
  private val clusterCtes =
    s"""$shingleSql,
       |pairs AS (
       |  SELECT a.doc AS da, b.doc AS db, COUNT(*) AS common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
       |  GROUP BY 1, 2),
       |jp AS (
       |  SELECT p.da, p.db FROM pairs p
       |  JOIN sizes sa ON p.da = sa.doc JOIN sizes sb ON p.db = sb.doc
       |  WHERE CAST(p.common AS DOUBLE)
       |    / CAST(sa.n_shingles + sb.n_shingles - p.common AS DOUBLE) >= 0.2),
       |edges AS (
       |  SELECT da AS u, db AS v FROM jp
       |  UNION SELECT db AS u, da AS v FROM jp),
       |nodes AS (SELECT DISTINCT u AS n FROM edges),
       |reach(n, l) AS (
       |  SELECT n, n FROM nodes
       |  UNION
       |  SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n),
       |comp AS (SELECT n AS node, MIN(l) AS component FROM reach GROUP BY n),
       |toks AS (
       |  SELECT doc_id, CAST(len($wsSql) AS BIGINT) AS n_tokens FROM documents)""".stripMargin

  /** Exact dedup over two overlapping "crawls": md5(text) content key,
    * keep-min-id policy, dupe-group census. */
  val q36 = GQuery(
    "q36_dedup_exact",
    (s, d) => {
      val docs = documents(s, d)
      val union = docs.unionByName(docs.filter(col("doc_id") % 3 === 0)
        .withColumn("doc_id", col("doc_id") + 10000))
      Dedup.exact(union, md5(col("text")), "doc_id")
        .agg(
          lcount(lit(1)).as("n_keys"),
          sum(col("n_copies")).as("n_rows"),
          count(when(col("n_copies") > 1, lit(1))).as("n_dup_keys"),
          min(col("keep_id")).as("min_keep"),
          max(col("keep_id")).as("max_keep"))
    },
    Some("""WITH u AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0),
      |k AS (
      |  SELECT md5(text) AS key, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |  FROM u GROUP BY 1)
      |SELECT COUNT(*) AS n_keys, CAST(SUM(n_copies) AS BIGINT) AS n_rows,
      |COUNT(CASE WHEN n_copies > 1 THEN 1 END) AS n_dup_keys,
      |MIN(keep_id) AS min_keep, MAX(keep_id) AS max_keep
      |FROM k""".stripMargin))

  /** Exact n-gram Jaccard near-dup pairs (word 5-shingles, inverted-
    * index pair generation, threshold 0.6). */
  val q37 = GQuery(
    "q37_ngram_jaccard",
    (s, d) =>
      Dedup.ngramJaccardPairs(documents(s, d), "doc_id", "text", k = 5, threshold = 0.6)
        .select(col("da"), col("db"), col("common"), col("na"), col("nb"),
          round(col("jaccard"), 6).as("jaccard")),
    Some(s"""WITH $shingleSql,
      |pairs AS (
      |  SELECT a.doc AS da, b.doc AS db, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
      |  GROUP BY 1, 2)
      |SELECT p.da, p.db, p.common, sa.n_shingles AS na, sb.n_shingles AS nb,
      |round(CAST(p.common AS DOUBLE)
      |  / CAST(sa.n_shingles + sb.n_shingles - p.common AS DOUBLE), 6) AS jaccard
      |FROM pairs p
      |JOIN sizes sa ON p.da = sa.doc JOIN sizes sb ON p.db = sb.doc
      |WHERE CAST(p.common AS DOUBLE)
      |  / CAST(sa.n_shingles + sb.n_shingles - p.common AS DOUBLE) >= 0.6""".stripMargin),
    headline = true)

  /** MinHash(16 perms) + LSH(4 bands × 4 rows) near-dup pairs with
    * exact-Jaccard verification ≥ 0.6 and the signature estimate. */
  val q38 = GQuery(
    "q38_minhash_lsh",
    (s, d) =>
      Dedup.minhashLshPairs(documents(s, d), "doc_id", "text",
        k = 5, numPerms = 16, rowsPerBand = 4, threshold = 0.6)
        .select(col("da"), col("db"),
          round(col("jaccard"), 6).as("jaccard"),
          round(col("est_jaccard"), 6).as("est_jaccard")),
    Some(s"""WITH $shingleSql,
      |h AS (
      |  SELECT doc, p,
      |    ((2654435761 * (p + 1) % 2147483647)
      |      * CAST(('0x' || substr(md5(shingle), 1, 7)) AS BIGINT) + p) % 2147483647 AS hv
      |  FROM sh, UNNEST(generate_series(0, 15)) AS up(p)),
      |sig AS (SELECT doc, p, MIN(hv) AS minh FROM h GROUP BY doc, p),
      |bands AS (
      |  SELECT doc, p // 4 AS band,
      |    md5(string_agg(CAST(minh AS VARCHAR), '-' ORDER BY p)) AS bkey
      |  FROM sig GROUP BY doc, p // 4),
      |cand AS (
      |  SELECT DISTINCT x.doc AS da, y.doc AS db
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc < y.doc),
      |est AS (
      |  SELECT c.da, c.db,
      |    CAST(COUNT(CASE WHEN sa.minh = sb.minh THEN 1 END) AS DOUBLE) / 16 AS est_jaccard
      |  FROM cand c
      |  JOIN sig sa ON sa.doc = c.da JOIN sig sb ON sb.doc = c.db AND sa.p = sb.p
      |  GROUP BY c.da, c.db),
      |common AS (
      |  SELECT a.doc AS da, b.doc AS db, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
      |  JOIN cand c ON c.da = a.doc AND c.db = b.doc
      |  GROUP BY 1, 2)
      |SELECT e.da, e.db,
      |round(CAST(COALESCE(cm.common, 0) AS DOUBLE)
      |  / CAST(sa.n_shingles + sb.n_shingles - COALESCE(cm.common, 0) AS DOUBLE), 6) AS jaccard,
      |round(e.est_jaccard, 6) AS est_jaccard
      |FROM est e
      |LEFT JOIN common cm ON e.da = cm.da AND e.db = cm.db
      |JOIN sizes sa ON e.da = sa.doc JOIN sizes sb ON e.db = sb.doc
      |WHERE CAST(COALESCE(cm.common, 0) AS DOUBLE)
      |  / CAST(sa.n_shingles + sb.n_shingles - COALESCE(cm.common, 0) AS DOUBLE) >= 0.6""".stripMargin))

  /** SimHash near-dups: 60-bit md5-vote fingerprints, banded Hamming ≤ 3
    * search (pigeonhole-exact for 4 bands); oracle checks all pairs. */
  val q39 = GQuery(
    "q39_simhash",
    (s, d) =>
      Dedup.simhashPairs(documents(s, d), "doc_id", "text", maxHamming = 3, numBands = 4),
    Some("""WITH tf AS (
      |  SELECT doc_id AS doc, tok, COUNT(*) AS tf, md5(tok) AS hex
      |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |        FROM documents) t
      |  GROUP BY doc_id, tok),
      |bits AS (
      |  SELECT doc, b,
      |    SUM(tf * (2 * ((strpos('0123456789abcdef', substr(hex, b // 4 + 1, 1)) - 1 >> (b % 4)) & 1) - 1)) AS s
      |  FROM tf, UNNEST(generate_series(0, 59)) AS u(b)
      |  GROUP BY doc, b),
      |simh AS (
      |  SELECT doc,
      |    CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
      |  FROM bits GROUP BY doc)
      |SELECT a.doc AS da, b.doc AS db,
      |CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      |FROM simh a JOIN simh b ON a.doc < b.doc
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin))

  /** Near-dup clustering: Jaccard ≥ 0.2 pairs → connected components
    * (alternating large-star/small-star, `dedup/Components`) → cluster
    * census keyed by the component's minimum doc id. The oracle derives
    * the same components with a recursive transitive-closure CTE —
    * an independent algorithm agreeing on the partition. */
  val q57 = GQuery(
    "q57_neardup_clusters",
    (s, d) =>
      ngramComp02(s, d, probe = true)
        .groupBy(col("component"))
        .agg(lcount(lit(1)).as("n_docs")),
    Some(s"""WITH RECURSIVE $shingleSql,
      |pairs AS (
      |  SELECT a.doc AS da, b.doc AS db, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
      |  GROUP BY 1, 2),
      |jp AS (
      |  SELECT p.da, p.db FROM pairs p
      |  JOIN sizes sa ON p.da = sa.doc JOIN sizes sb ON p.db = sb.doc
      |  WHERE CAST(p.common AS DOUBLE)
      |    / CAST(sa.n_shingles + sb.n_shingles - p.common AS DOUBLE) >= 0.2),
      |edges AS (
      |  SELECT da AS u, db AS v FROM jp
      |  UNION SELECT db AS u, da AS v FROM jp),
      |nodes AS (SELECT DISTINCT u AS n FROM edges),
      |reach(n, l) AS (
      |  SELECT n, n FROM nodes
      |  UNION
      |  SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n),
      |comp AS (SELECT n AS node, MIN(l) AS component FROM reach GROUP BY n)
      |SELECT component, COUNT(*) AS n_docs
      |FROM comp GROUP BY component""".stripMargin))

  /** Winnowed rolling-hash fingerprints (`Dedup.winnowedFingerprints`,
    * k=3 token-grams, window w=4) with a per-doc census and the count
    * of fingerprints shared by more than one document — the winnowing
    * selectivity + collision profile. Integer arithmetic end-to-end. */
  val q61 = GQuery(
    "q61_winnow_fingerprint",
    (s, d) => {
      val fps = Dedup.winnowedFingerprints(documents(s, d), "doc_id", "text")
      val perDoc = fps.groupBy(col("doc")).agg(lcount(lit(1)).as("n_fps"))
      val shared = fps.groupBy(col("fp")).agg(lcount(lit(1)).as("n_docs"))
      perDoc.agg(
        lcount(lit(1)).as("n_docs_fingerprinted"),
        sum(col("n_fps")).cast("long").as("n_doc_fps"),
        min(col("n_fps")).as("min_fps"),
        max(col("n_fps")).as("max_fps"))
        .crossJoin(shared.agg(
          lcount(lit(1)).as("n_distinct_fps"),
          count(when(col("n_docs") > 1, lit(1))).as("n_shared_fps")))
    },
    Some(s"""WITH toks AS (
      |  SELECT doc_id AS doc, i,
      |    CAST(('0x' || substr(md5(ws[i]), 1, 7)) AS BIGINT) AS h
      |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, len(ws))) AS u(i)),
      |kg AS (
      |  SELECT doc, i,
      |    ((h * 1000003 + lead(h, 1) OVER wd) % 2147483647
      |      * 1000003 + lead(h, 2) OVER wd) % 2147483647 AS kh
      |  FROM toks
      |  WINDOW wd AS (PARTITION BY doc ORDER BY i)),
      |fps AS (
      |  SELECT DISTINCT doc,
      |    MIN(kh) OVER (PARTITION BY doc ORDER BY i
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |  FROM kg WHERE kh IS NOT NULL),
      |per_doc AS (SELECT doc, COUNT(*) AS n_fps FROM fps GROUP BY doc),
      |shared AS (SELECT fp, COUNT(*) AS n_docs FROM fps GROUP BY fp)
      |SELECT
      |  (SELECT COUNT(*) FROM per_doc) AS n_docs_fingerprinted,
      |  (SELECT CAST(SUM(n_fps) AS BIGINT) FROM per_doc) AS n_doc_fps,
      |  (SELECT MIN(n_fps) FROM per_doc) AS min_fps,
      |  (SELECT MAX(n_fps) FROM per_doc) AS max_fps,
      |  (SELECT COUNT(*) FROM shared) AS n_distinct_fps,
      |  (SELECT COUNT(CASE WHEN n_docs > 1 THEN 1 END) FROM shared) AS n_shared_fps""".stripMargin))

  /** q88: incremental near-dup — the batch (doc_id % 3 = 0) probes the
    * LANDED corpus index (everything else) for band collisions plus its
    * own internal collisions; only candidate pairs are verified and
    * corpus-internal pairs are never re-reported (process-once). Same
    * MinHash parameters as q38.
    *
    * NOT routed through the `core/Landed` registry (unlike the
    * ngram-comp / SA / JW-match families): measured r10, landing the
    * DedupIndex faces made the q88+q90 pair 3.3 → 4.8 s. buildIndex
    * already pins the CPU-dense shingle pass eagerly, its `bands`
    * face is a cheap LAZY derivation that each consumer prunes to its
    * own columns, and q90's cost is batch-side work — so a landing
    * only adds a full un-pruned materialization of the band table. */
  val q88 = GQuery(
    "q88_incremental_neardup",
    (s, d) => {
      val docs = documents(s, d)
      val corpus = Dedup.buildIndex(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", k = 5, numPerms = 16, rowsPerBand = 4)
      Dedup.incrementalNearDups(docs.filter(col("doc_id") % 3 === 0), corpus,
          "doc_id", "text", k = 5, numPerms = 16, rowsPerBand = 4, threshold = 0.6)
        .select(col("da"), col("db"), round(col("jaccard"), 6).as("jaccard"))
    },
    Some(s"""WITH $shingleSql,
      |h AS (
      |  SELECT doc, p,
      |    ((2654435761 * (p + 1) % 2147483647)
      |      * CAST(('0x' || substr(md5(shingle), 1, 7)) AS BIGINT) + p) % 2147483647 AS hv
      |  FROM sh, UNNEST(generate_series(0, 15)) AS up(p)),
      |sig AS (SELECT doc, p, MIN(hv) AS minh FROM h GROUP BY doc, p),
      |bands AS (
      |  SELECT doc, p // 4 AS band,
      |    md5(string_agg(CAST(minh AS VARCHAR), '-' ORDER BY p)) AS bkey
      |  FROM sig GROUP BY doc, p // 4),
      |bn AS (SELECT * FROM bands WHERE doc % 3 = 0),
      |bc AS (SELECT * FROM bands WHERE doc % 3 <> 0),
      |cand AS (
      |  SELECT DISTINCT da, db FROM (
      |    SELECT x.doc AS da, y.doc AS db FROM bn x JOIN bc y
      |      ON x.band = y.band AND x.bkey = y.bkey AND x.doc <> y.doc
      |    UNION ALL
      |    SELECT x.doc AS da, y.doc AS db FROM bn x JOIN bn y
      |      ON x.band = y.band AND x.bkey = y.bkey AND x.doc < y.doc)),
      |common AS (
      |  SELECT c.da, c.db, COUNT(*) AS common
      |  FROM cand c JOIN sh a ON a.doc = c.da JOIN sh b
      |    ON b.doc = c.db AND a.shingle = b.shingle
      |  GROUP BY 1, 2)
      |SELECT c.da, c.db,
      |  round(CAST(COALESCE(cm.common, 0) AS DOUBLE)
      |    / CAST(sa.n_shingles + sb.n_shingles - COALESCE(cm.common, 0) AS DOUBLE), 6) AS jaccard
      |FROM cand c
      |LEFT JOIN common cm ON c.da = cm.da AND c.db = cm.db
      |JOIN sizes sa ON c.da = sa.doc JOIN sizes sb ON c.db = sb.doc
      |WHERE CAST(COALESCE(cm.common, 0) AS DOUBLE)
      |  / CAST(sa.n_shingles + sb.n_shingles - COALESCE(cm.common, 0) AS DOUBLE) >= 0.6""".stripMargin))

  /** q90: decontamination — training docs (doc_id % 3 = 0) that
    * near-dup the protected set (the rest) are REMOVED; census of the
    * survivors. Same LSH parameters as q38/q88. */
  val q90 = GQuery(
    "q90_decontaminate",
    (s, d) => {
      val docs = documents(s, d)
      val protIdx = Dedup.buildIndex(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", k = 5, numPerms = 16, rowsPerBand = 4)
      Dedup.decontaminate(docs.filter(col("doc_id") % 3 === 0), protIdx,
          "doc_id", "text", k = 5, numPerms = 16, rowsPerBand = 4, threshold = 0.6)
        .agg(
          lcount(lit(1)).as("n_survivors"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
    },
    Some(s"""WITH $shingleSql,
      |h AS (
      |  SELECT doc, p,
      |    ((2654435761 * (p + 1) % 2147483647)
      |      * CAST(('0x' || substr(md5(shingle), 1, 7)) AS BIGINT) + p) % 2147483647 AS hv
      |  FROM sh, UNNEST(generate_series(0, 15)) AS up(p)),
      |sig AS (SELECT doc, p, MIN(hv) AS minh FROM h GROUP BY doc, p),
      |bands AS (
      |  SELECT doc, p // 4 AS band,
      |    md5(string_agg(CAST(minh AS VARCHAR), '-' ORDER BY p)) AS bkey
      |  FROM sig GROUP BY doc, p // 4),
      |cand AS (
      |  SELECT DISTINCT x.doc AS da, y.doc AS db
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND x.bkey = y.bkey
      |  WHERE x.doc % 3 = 0 AND y.doc % 3 <> 0),
      |common AS (
      |  SELECT c.da, c.db, COUNT(*) AS common
      |  FROM cand c JOIN sh a ON a.doc = c.da JOIN sh b
      |    ON b.doc = c.db AND a.shingle = b.shingle
      |  GROUP BY 1, 2),
      |contaminated AS (
      |  SELECT DISTINCT c.da
      |  FROM cand c
      |  LEFT JOIN common cm ON c.da = cm.da AND c.db = cm.db
      |  JOIN sizes sa ON c.da = sa.doc JOIN sizes sb ON c.db = sb.doc
      |  WHERE CAST(COALESCE(cm.common, 0) AS DOUBLE)
      |    / CAST(sa.n_shingles + sb.n_shingles - COALESCE(cm.common, 0) AS DOUBLE) >= 0.6)
      |SELECT COUNT(*) AS n_survivors, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents
      |WHERE doc_id % 3 = 0
      |  AND doc_id NOT IN (SELECT da FROM contaminated)""".stripMargin))

  /** q103: pairwise corpus-overlap audit over every source pair
    * ([[graft.dedup.Overlap.kmvOverlap]]) — KMV sketches of each
    * source's distinct 5-shingle hashes (k = 128), the sketch-derived
    * union / intersection / Jaccard estimates, and the exact figures
    * alongside (the estimates are deterministic md5 arithmetic, so the
    * oracle replays sketch AND truth bit-for-bit; the gap between the
    * columns is the sketch's real, reproducible error). */
  val q103 = GQuery(
    "q103_corpus_overlap",
    (s, d) => {
      val k = 128
      val sh = graft.core.Widen.widen(documents(s, d))
        .select(col("source"),
          graft.text.TextFunctions.wsTokens(col("text")).as("__ws"))
        .select(col("source"),
          explode(graft.text.TextFunctions.shingles(col("__ws"), 5)).as("shingle"))
        .select(col("source"), md5(col("shingle")).as("h"))
        .distinct()
      val est = graft.dedup.Overlap.kmvOverlap(sh, "source", "h", k)
      val ex = sh.select(col("source").as("source_a"), col("h"))
        .join(sh.select(col("source").as("source_b"), col("h")), Seq("h"))
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(lcount(lit(1)).as("n_common"))
      est.join(ex, Seq("source_a", "source_b"), "left")
        .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
        .select(col("source_a"), col("source_b"), col("nd_a"), col("nd_b"),
          col("n_common"),
          round(col("n_common").cast("double") /
            (col("nd_a") + col("nd_b") - col("n_common")).cast("double"), 6)
            .as("exact_jaccard"),
          round(col("est_jaccard"), 6).as("est_jaccard"),
          round(col("est_union"), 2).as("est_union"),
          round(col("est_intersection"), 2).as("est_intersection"))
    },
    Some(s"""WITH sh AS (
      |  SELECT DISTINCT source, md5(
      |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]) AS h
      |  FROM (SELECT source, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, greatest(len(ws) - 4, 0))) AS u(i)),
      |skr AS (
      |  SELECT source, h,
      |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
      |    COUNT(*) OVER (PARTITION BY source) AS nd
      |  FROM sh),
      |sk AS (SELECT source, h, nd FROM skr WHERE rn <= 128),
      |nds AS (SELECT source, MAX(nd) AS nd FROM skr GROUP BY source),
      |pairs AS (
      |  SELECT a.source AS sa, b.source AS sb, a.nd AS nd_a, b.nd AS nd_b
      |  FROM nds a JOIN nds b ON a.source < b.source),
      |u AS (
      |  SELECT p.sa, p.sb, s.h,
      |    MAX(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS in_a,
      |    MAX(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS in_b
      |  FROM pairs p JOIN sk s ON s.source IN (p.sa, p.sb)
      |  GROUP BY p.sa, p.sb, s.h),
      |ur AS (
      |  SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn,
      |    COUNT(*) OVER (PARTITION BY sa, sb) AS msz
      |  FROM u),
      |estp AS (
      |  SELECT sa, sb, MAX(msz) AS msz,
      |    LEAST(MAX(msz), 128) AS usz,
      |    SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS hit,
      |    MAX(CASE WHEN rn = 128 THEN (
      |      (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456.0 +
      |      (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216.0 +
      |      (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576.0 +
      |      (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536.0 +
      |      (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096.0 +
      |      (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256.0 +
      |      (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16.0 +
      |      (strpos('0123456789abcdef', substr(h, 8, 1)) - 1) * 1.0
      |    ) / 4294967296.0 END) AS kth_frac
      |  FROM ur WHERE rn <= 128 GROUP BY sa, sb),
      |ests AS (
      |  SELECT sa, sb, usz, hit,
      |    CASE WHEN msz < 128 THEN CAST(msz AS DOUBLE)
      |         ELSE 127.0 / kth_frac END AS est_union,
      |    CAST(hit AS DOUBLE) / CAST(usz AS DOUBLE) AS est_jaccard
      |  FROM estp),
      |ex AS (
      |  SELECT a.source AS sa, b.source AS sb, COUNT(*) AS n_common
      |  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT p.sa AS source_a, p.sb AS source_b,
      |  CAST(p.nd_a AS BIGINT) AS nd_a, CAST(p.nd_b AS BIGINT) AS nd_b,
      |  CAST(COALESCE(x.n_common, 0) AS BIGINT) AS n_common,
      |  round(CAST(COALESCE(x.n_common, 0) AS DOUBLE)
      |    / CAST(p.nd_a + p.nd_b - COALESCE(x.n_common, 0) AS DOUBLE), 6) AS exact_jaccard,
      |  round(e.est_jaccard, 6) AS est_jaccard,
      |  round(e.est_union, 2) AS est_union,
      |  round(e.est_jaccard * e.est_union, 2) AS est_intersection
      |FROM pairs p
      |JOIN ests e ON p.sa = e.sa AND p.sb = e.sb
      |LEFT JOIN ex x ON p.sa = x.sa AND p.sb = x.sb""".stripMargin))

  /** q108: cross-split contamination audit ([[Dedup.splitLeakage]]) —
    * the q38 near-dup pairs labelled with each endpoint's q100-style
    * hash-split membership and rolled up per unordered split pair.
    * Same-split rows are redundancy; cross-split rows are exactly the
    * train→eval leakage a held-out metric must not contain. The oracle
    * replays shingles → MinHash → bands → candidates → exact Jaccard →
    * split draw → matrix, bit-for-bit. */
  val q108 = {
    val splitSpec = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val th = graft.operators.Splits.cumThresholds(splitSpec)
    def splitCase(idExpr: String): String =
      "CASE " + th.init.map { case (n, ub) =>
        s"WHEN CAST(('0x' || substr(md5('split-' || CAST($idExpr AS VARCHAR)), 1, 7)) AS BIGINT) / 268435456.0 < $ub THEN '$n'"
      }.mkString(" ") + s" ELSE '${th.last._1}' END"
    GQuery(
      "q108_split_leakage",
      (s, d) =>
        Dedup.splitLeakage(documents(s, d), "doc_id", "text", splitSpec,
            k = 5, numPerms = 16, rowsPerBand = 4, threshold = 0.6)
          .select(col("split_a"), col("split_b"), col("n_pairs"),
            round(col("min_jaccard"), 6).as("min_jaccard"),
            round(col("max_jaccard"), 6).as("max_jaccard"),
            round(col("mean_est"), 6).as("mean_est")),
      Some(s"""WITH $shingleSql,
        |h AS (
        |  SELECT doc, p,
        |    ((2654435761 * (p + 1) % 2147483647)
        |      * CAST(('0x' || substr(md5(shingle), 1, 7)) AS BIGINT) + p) % 2147483647 AS hv
        |  FROM sh, UNNEST(generate_series(0, 15)) AS up(p)),
        |sig AS (SELECT doc, p, MIN(hv) AS minh FROM h GROUP BY doc, p),
        |bands AS (
        |  SELECT doc, p // 4 AS band,
        |    md5(string_agg(CAST(minh AS VARCHAR), '-' ORDER BY p)) AS bkey
        |  FROM sig GROUP BY doc, p // 4),
        |cand AS (
        |  SELECT DISTINCT x.doc AS da, y.doc AS db
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc < y.doc),
        |agr AS (
        |  SELECT c.da, c.db, COUNT(CASE WHEN sa.minh = sb.minh THEN 1 END) AS agree
        |  FROM cand c
        |  JOIN sig sa ON sa.doc = c.da JOIN sig sb ON sb.doc = c.db AND sa.p = sb.p
        |  GROUP BY c.da, c.db),
        |common AS (
        |  SELECT a.doc AS da, b.doc AS db, COUNT(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
        |  JOIN cand c ON c.da = a.doc AND c.db = b.doc
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT ag.da, ag.db, ag.agree,
        |    CAST(COALESCE(cm.common, 0) AS DOUBLE)
        |      / CAST(sa.n_shingles + sb.n_shingles - COALESCE(cm.common, 0) AS DOUBLE) AS jaccard
        |  FROM agr ag
        |  LEFT JOIN common cm ON ag.da = cm.da AND ag.db = cm.db
        |  JOIN sizes sa ON ag.da = sa.doc JOIN sizes sb ON ag.db = sb.doc
        |  WHERE CAST(COALESCE(cm.common, 0) AS DOUBLE)
        |    / CAST(sa.n_shingles + sb.n_shingles - COALESCE(cm.common, 0) AS DOUBLE) >= 0.6),
        |lab AS (
        |  SELECT ${splitCase("da")} AS sa, ${splitCase("db")} AS sb, jaccard, agree
        |  FROM p)
        |SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
        |  COUNT(*) AS n_pairs,
        |  round(MIN(jaccard), 6) AS min_jaccard,
        |  round(MAX(jaccard), 6) AS max_jaccard,
        |  round(CAST(SUM(agree) AS DOUBLE) / (16 * COUNT(*)), 6) AS mean_est
        |FROM lab GROUP BY 1, 2""".stripMargin))
  }

  /** q118: canonical election over the q57 near-dup clusters
    * ([[graft.dedup.Components.electCanonical]]) — the step that turns
    * a cluster map into keep/drop verdicts. Quality = token count
    * (keep the most complete crawl), ties to the smallest id. The
    * census pins the elected ids (sum), the kept token mass, and the
    * dropped token mass per component. */
  /** The k=5 / θ=0.2 near-dup pairs and their component map FOUR
    * queries share (q57 census, q118 election, q162 preference pairs,
    * q180 splits): q118 LANDS both ([[graft.core.Landed]] — it runs
    * first alphabetically), the rest PROBE — the shingle/inverted-
    * index pair generation and the large-star/small-star rounds run
    * once per suite, not four times. */
  private def ngramPairs02(s: org.apache.spark.sql.SparkSession, d: String,
                           probe: Boolean) = {
    def build = Dedup.ngramJaccardPairs(documents(s, d), "doc_id", "text",
        k = 5, threshold = 0.2)
      .select(col("da"), col("db"))
    if (probe) graft.core.Landed.probeOrBuild(s, s"ngram-pairs-5-02:$d")(build)
    else graft.core.Landed.land(s, s"ngram-pairs-5-02:$d")(build)
  }

  private def ngramComp02(s: org.apache.spark.sql.SparkSession, d: String,
                          probe: Boolean) = {
    def build = graft.dedup.Components.connected(
      ngramPairs02(s, d, probe = true), "da", "db")
    if (probe) graft.core.Landed.probeOrBuild(s, s"ngram-comp-5-02:$d")(build)
    else graft.core.Landed.land(s, s"ngram-comp-5-02:$d")(build)
  }

  val q118 = GQuery(
    "q118_cluster_election",
    (s, d) => {
      val docs = documents(s, d)
      ngramPairs02(s, d, probe = false) // produce the pair landing
      val toks = docs.select(col("doc_id"),
        size(graft.text.TextFunctions.wsTokens(col("text"))).cast("long").as("n_tokens"))
      graft.dedup.Components.electCanonicalFrom(
          ngramComp02(s, d, probe = false), toks, "doc_id", "n_tokens")
        .groupBy(col("component"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          sum(when(col("is_canonical"), col("doc_id"))).as("keep_id"),
          sum(when(col("is_canonical"), col("n_tokens"))).as("tokens_kept"),
          sum(when(!col("is_canonical"), col("n_tokens"))).as("tokens_dropped"))
    },
    Some(s"""WITH RECURSIVE $clusterCtes,
      |elected AS (
      |  SELECT c.node AS doc_id, c.component, t.n_tokens,
      |    row_number() OVER (PARTITION BY c.component
      |                       ORDER BY t.n_tokens DESC, c.node ASC) = 1 AS is_canonical
      |  FROM comp c JOIN toks t ON c.node = t.doc_id)
      |SELECT component, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN is_canonical THEN doc_id END) AS BIGINT) AS keep_id,
      |  CAST(SUM(CASE WHEN is_canonical THEN n_tokens END) AS BIGINT) AS tokens_kept,
      |  CAST(SUM(CASE WHEN NOT is_canonical THEN n_tokens END) AS BIGINT) AS tokens_dropped
      |FROM elected GROUP BY component""".stripMargin))

  /** q123: span-level contamination localization
    * ([[graft.dedup.Dedup.contaminationSpans]]) — the benchmark is the
    * doc_id % 97 == 0 slice (guaranteed shared phrasing with its
    * near-dup train-side neighbours), the corpus the rest. Per flagged
    * doc: matched winnowed-window count and first/last matched token
    * position. */
  val q123 = GQuery(
    "q123_contamination_spans",
    (s, d) => {
      val docs = documents(s, d)
      Dedup.contaminationSpans(
        corpus = docs.filter(col("doc_id") % 97 =!= 0),
        benchmark = docs.filter(col("doc_id") % 97 === 0),
        idCol = "doc_id", textCol = "text")
        .select(col("doc"), col("n_matched"), col("first_pos"), col("last_pos"))
    },
    Some(s"""WITH toks AS (
      |  SELECT doc_id AS doc, i,
      |    CAST(('0x' || substr(md5(ws[i]), 1, 7)) AS BIGINT) AS h
      |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, len(ws))) AS u(i)),
      |kg AS (
      |  SELECT doc, i,
      |    ((h * 1000003 + lead(h, 1) OVER wd) % 2147483647
      |      * 1000003 + lead(h, 2) OVER wd) % 2147483647 AS kh
      |  FROM toks
      |  WINDOW wd AS (PARTITION BY doc ORDER BY i)),
      |sp AS (
      |  SELECT DISTINCT doc, i - 1 AS pos,
      |    MIN(kh) OVER (PARTITION BY doc ORDER BY i
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |  FROM kg WHERE kh IS NOT NULL),
      |bv AS (SELECT DISTINCT fp FROM sp WHERE doc % 97 = 0),
      |m AS (
      |  SELECT s.doc, s.pos FROM sp s JOIN bv ON s.fp = bv.fp
      |  WHERE s.doc % 97 <> 0)
      |SELECT doc, COUNT(*) AS n_matched,
      |  CAST(MIN(pos) AS INT) AS first_pos, CAST(MAX(pos) AS INT) AS last_pos
      |FROM m GROUP BY doc""".stripMargin))

  /** q124: surgical span removal
    * ([[graft.dedup.Dedup.removeContaminatedSpans]]) over the q123
    * workload — flagged docs keep everything outside their matched
    * windows. The integer md5-prefix signature pins the rebuilt bytes
    * of every cleaned document. */
  val q124 = GQuery(
    "q124_span_removal",
    (s, d) => {
      val docs = documents(s, d)
      Dedup.removeContaminatedSpans(
        corpus = docs.filter(col("doc_id") % 97 =!= 0),
        benchmark = docs.filter(col("doc_id") % 97 === 0),
        idCol = "doc_id", textCol = "text")
        .select(col("doc"), col("n_kept"), col("n_removed"),
          conv(substring(md5(col("clean_text")), 1, 7), 16, 10)
            .cast("long").as("sig"))
    },
    Some(s"""WITH toks AS (
      |  SELECT doc_id AS doc, i, ws[i] AS tok,
      |    CAST(('0x' || substr(md5(ws[i]), 1, 7)) AS BIGINT) AS h
      |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, len(ws))) AS u(i)),
      |kg AS (
      |  SELECT doc, i,
      |    ((h * 1000003 + lead(h, 1) OVER wd) % 2147483647
      |      * 1000003 + lead(h, 2) OVER wd) % 2147483647 AS kh
      |  FROM toks
      |  WINDOW wd AS (PARTITION BY doc ORDER BY i)),
      |sp AS (
      |  SELECT DISTINCT doc, i - 1 AS pos,
      |    MIN(kh) OVER (PARTITION BY doc ORDER BY i
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |  FROM kg WHERE kh IS NOT NULL),
      |bv AS (SELECT DISTINCT fp FROM sp WHERE doc % 97 = 0),
      |m AS (
      |  SELECT s.doc, s.pos FROM sp s JOIN bv ON s.fp = bv.fp
      |  WHERE s.doc % 97 <> 0),
      |flagged AS (SELECT DISTINCT doc FROM m),
      |ft AS (SELECT t.* FROM toks t JOIN flagged f ON t.doc = f.doc),
      |cov AS (
      |  SELECT DISTINCT t.doc, t.i FROM ft t
      |  JOIN m ON t.doc = m.doc AND t.i - 1 BETWEEN m.pos AND m.pos + 5),
      |kept AS (
      |  SELECT t.doc, t.i, t.tok FROM ft t
      |  ANTI JOIN cov c ON t.doc = c.doc AND t.i = c.i),
      |reb AS (
      |  SELECT doc, COUNT(*) AS n_kept,
      |    string_agg(tok, ' ' ORDER BY i) AS clean_text
      |  FROM kept GROUP BY doc),
      |tot AS (SELECT doc, COUNT(*) AS n_total FROM ft GROUP BY doc)
      |SELECT tot.doc, COALESCE(reb.n_kept, 0) AS n_kept,
      |  CAST(tot.n_total - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_removed,
      |  CAST(('0x' || substr(md5(COALESCE(reb.clean_text, '')), 1, 7)) AS BIGINT) AS sig
      |FROM tot LEFT JOIN reb ON tot.doc = reb.doc""".stripMargin))

  /** q138: within-corpus exact duplicate-span removal
    * ([[graft.dedup.Dedup.selfSpanDedup]], the ExactSubstr self-dedup
    * discipline): every 8-token span occurring more than once in the
    * corpus keeps only its first occurrence by (doc, start); later
    * occurrences' positions are excised and the document is rebuilt.
    * Distinct from q124 (which excises corpus spans leaked from a
    * PROTECTED benchmark): here the corpus is deduplicated against
    * itself with a keep-first survivor policy. The md5-prefix signature
    * pins the rebuilt bytes of every cleaned document. */
  val q138 = GQuery(
    "q138_exact_span_dedup",
    (s, d) =>
      Dedup.selfSpanDedup(documents(s, d), "doc_id", "text", n = 8)
        .select(col("doc"), col("n_tokens"), col("n_removed"),
          conv(substring(md5(col("clean_text")), 1, 7), 16, 10)
            .cast("long").as("sig")),
    Some(s"""WITH t AS (SELECT doc_id AS doc, $wsSql AS ws FROM documents),
      |g AS (
      |  SELECT doc, u.i AS i, array_to_string(ws[u.i:u.i+7], ' ') AS gram
      |  FROM t, UNNEST(generate_series(1, len(ws) - 7)) AS u(i)),
      |r AS (
      |  SELECT doc, i,
      |    COUNT(*) OVER (PARTITION BY gram) AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc, i) AS rn
      |  FROM g),
      |mask AS (
      |  SELECT DISTINCT doc, u.p - 1 AS pos
      |  FROM r, UNNEST(generate_series(i, i + 7)) AS u(p)
      |  WHERE cnt > 1 AND rn > 1),
      |toks AS (
      |  SELECT doc, u.i - 1 AS pos, ws[u.i] AS tok
      |  FROM t, UNNEST(generate_series(1, len(ws))) AS u(i)),
      |kept AS (
      |  SELECT tk.doc, tk.pos, tk.tok
      |  FROM toks tk LEFT JOIN mask m ON tk.doc = m.doc AND tk.pos = m.pos
      |  WHERE m.pos IS NULL),
      |nrem AS (SELECT doc, COUNT(*) AS n_removed FROM mask GROUP BY doc),
      |reb AS (
      |  SELECT doc, string_agg(tok, ' ' ORDER BY pos) AS clean_text
      |  FROM kept GROUP BY doc)
      |SELECT t.doc, CAST(len(t.ws) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(nrem.n_removed, 0) AS BIGINT) AS n_removed,
      |  CAST(('0x' || substr(md5(COALESCE(reb.clean_text, '')), 1, 7)) AS BIGINT) AS sig
      |FROM t
      |LEFT JOIN nrem ON t.doc = nrem.doc
      |LEFT JOIN reb ON t.doc = reb.doc""".stripMargin))

  /** q142: incremental duplicate-span removal
    * ([[graft.dedup.Dedup.incrementalSpanDedup]]) — the batch arm of
    * q138: new docs (doc_id % 4 == 0) are cleaned against the landed
    * corpus's gram-fingerprint index plus themselves; the landed text
    * is never rescanned and work tracks the batch. Same per-doc
    * md5-prefix signature discipline as q138. */
  val q142 = GQuery(
    "q142_incremental_span_dedup",
    (s, d) => {
      val docs = documents(s, d)
      val landed = docs.filter(col("doc_id") % 4 =!= 0)
      val batch = docs.filter(col("doc_id") % 4 === 0)
      Dedup.incrementalSpanDedup(batch,
        Dedup.spanGramIndex(landed, "doc_id", "text", n = 8),
        "doc_id", "text", n = 8)
        .select(col("doc"), col("n_tokens"), col("n_removed"),
          conv(substring(md5(col("clean_text")), 1, 7), 16, 10)
            .cast("long").as("sig"))
    },
    Some(s"""WITH t AS (SELECT doc_id AS doc, $wsSql AS ws FROM documents),
      |oldg AS (
      |  SELECT DISTINCT array_to_string(ws[u.i:u.i+7], ' ') AS gram
      |  FROM t, UNNEST(generate_series(1, len(ws) - 7)) AS u(i)
      |  WHERE doc % 4 <> 0),
      |tn AS (SELECT doc, ws FROM t WHERE doc % 4 = 0),
      |g AS (
      |  SELECT doc, u.i AS i, array_to_string(ws[u.i:u.i+7], ' ') AS gram
      |  FROM tn, UNNEST(generate_series(1, len(ws) - 7)) AS u(i)),
      |r AS (
      |  SELECT doc, i, gram,
      |    COUNT(*) OVER (PARTITION BY gram) AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc, i) AS rn
      |  FROM g),
      |rf AS (
      |  SELECT r.doc, r.i FROM r LEFT JOIN oldg o ON r.gram = o.gram
      |  WHERE o.gram IS NOT NULL OR (r.cnt > 1 AND r.rn > 1)),
      |mask AS (
      |  SELECT DISTINCT doc, u.p - 1 AS pos
      |  FROM rf, UNNEST(generate_series(i, i + 7)) AS u(p)),
      |toks AS (
      |  SELECT doc, u.i - 1 AS pos, ws[u.i] AS tok
      |  FROM tn, UNNEST(generate_series(1, len(ws))) AS u(i)),
      |kept AS (
      |  SELECT tk.doc, tk.pos, tk.tok
      |  FROM toks tk LEFT JOIN mask m ON tk.doc = m.doc AND tk.pos = m.pos
      |  WHERE m.pos IS NULL),
      |nrem AS (SELECT doc, COUNT(*) AS n_removed FROM mask GROUP BY doc),
      |reb AS (
      |  SELECT doc, string_agg(tok, ' ' ORDER BY pos) AS clean_text
      |  FROM kept GROUP BY doc)
      |SELECT tn.doc, CAST(len(tn.ws) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(nrem.n_removed, 0) AS BIGINT) AS n_removed,
      |  CAST(('0x' || substr(md5(COALESCE(reb.clean_text, '')), 1, 7)) AS BIGINT) AS sig
      |FROM tn
      |LEFT JOIN nrem ON tn.doc = nrem.doc
      |LEFT JOIN reb ON tn.doc = reb.doc""".stripMargin))

  /** q125: corpus snapshot diff ([[graft.dedup.Dedup.snapshotDiff]])
    * — v2 is a deterministic mutation of v1 (doc_id % 7 == 0 dropped,
    * % 5 == 0 re-crawled with changed bytes, % 11 == 0 re-ingested
    * under new ids). The per-status census is what an incremental
    * ingest run consumes: re-curate added ∪ changed, tombstone
    * removed, skip the unchanged mass. */
  val q125 = GQuery(
    "q125_snapshot_diff",
    (s, d) => {
      val docs = documents(s, d)
      val v1 = docs.select(col("doc_id"), md5(col("text")).as("fp"))
      val v2 = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("fp"))
        .unionByName(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 200000L).as("doc_id"), md5(col("text")).as("fp")))
      Dedup.snapshotDiff(v1, v2, "doc_id", "fp")
        .groupBy(col("status"))
        .agg(lcount(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_checksum"))
    },
    Some("""WITH v1 AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS fp
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 200000 AS doc_id, md5(text) AS fp
      |  FROM documents WHERE doc_id % 11 = 0),
      |j AS (
      |  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
      |    CASE WHEN v1.fp IS NULL THEN 'added'
      |         WHEN v2.fp IS NULL THEN 'removed'
      |         WHEN v1.fp = v2.fp THEN 'unchanged'
      |         ELSE 'changed' END AS status
      |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
      |SELECT status, COUNT(*) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      |FROM j GROUP BY status""".stripMargin))

  /** q127: corpus-order novelty scoring
    * ([[graft.dedup.Novelty.noveltyScores]]) — per document, the
    * fraction of its distinct 5-shingles first seen in THAT document
    * (minimum doc_id over the corpus). Exact duplicates of earlier
    * docs score 0, fresh prose ~1 — a per-document curation signal the
    * pairwise dedup queries can't express. One window over the shingle
    * index + one per-doc groupBy; postings-bounded. */
  val q127 = GQuery(
    "q127_novelty_scoring",
    (s, d) =>
      Novelty.noveltyScores(documents(s, d), "doc_id", "text", k = 5)
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          round(col("novelty"), 6).as("novelty")),
    Some(s"""WITH $shingleSql,
      |first AS (SELECT shingle, MIN(doc) AS fd FROM sh GROUP BY shingle),
      |nov AS (
      |  SELECT s.doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |    CAST(SUM(CASE WHEN f.fd = s.doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      |  FROM sh s JOIN first f ON s.shingle = f.shingle
      |  GROUP BY s.doc)
      |SELECT doc_id, n_shingles, n_novel,
      |  round(CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6) AS novelty
      |FROM nov""".stripMargin))

  /** q129: exact n-gram collision decontamination
    * ([[graft.dedup.NgramDecon.decontaminate]]) — training docs
    * (doc_id % 3 = 0) sharing ≥ 2 distinct 5-shingles with the
    * protected rest are removed; survivor census. The broadcast-bloom
    * prefilter (fpp 0.03) is on, and the oracle replays the EXACT
    * semantics with no bloom at all — any bloom-induced wrong drop or
    * keep hash-fails, which is the point: the sketch must be invisible
    * in the result. */
  val q129 = GQuery(
    "q129_exact_decontaminate",
    (s, d) => {
      val docs = documents(s, d)
      NgramDecon.decontaminate(
          docs.filter(col("doc_id") % 3 === 0),
          docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", k = 5, minCollisions = 2L, bloomFpp = Some(0.03))
        .agg(
          lcount(lit(1)).as("n_survivors"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
    },
    Some(s"""WITH $shingleSql,
      |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc % 3 <> 0),
      |hits AS (
      |  SELECT s.doc, COUNT(*) AS n
      |  FROM sh s JOIN bench b ON s.shingle = b.shingle
      |  WHERE s.doc % 3 = 0
      |  GROUP BY s.doc),
      |contaminated AS (SELECT doc FROM hits WHERE n >= 2)
      |SELECT COUNT(*) AS n_survivors,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents
      |WHERE doc_id % 3 = 0
      |  AND doc_id NOT IN (SELECT doc FROM contaminated)""".stripMargin))

  /** q133: incremental novelty
    * ([[graft.dedup.Novelty.incrementalNovelty]]) — the batch
    * (doc_id ≥ 350) scored against the landed corpus index
    * (doc_id < 350): shingles absent from the landed index are novel,
    * batch-internal first occurrences included. Census per batch doc;
    * work tracks the batch (anti-probe on the shingle key), the
    * landed mass is never rescanned. */
  val q133 = GQuery(
    "q133_incremental_novelty",
    (s, d) => {
      val docs = documents(s, d)
      Novelty.incrementalNovelty(
          docs.filter(col("doc_id") >= 350),
          Dedup.shingleIndex(docs.filter(col("doc_id") < 350), "doc_id", "text", 5),
          "doc_id", "text", k = 5)
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          round(col("novelty"), 6).as("novelty"))
    },
    Some(s"""WITH $shingleSql,
      |landed AS (SELECT DISTINCT shingle FROM sh WHERE doc < 350),
      |bsh AS (SELECT doc, shingle FROM sh WHERE doc >= 350),
      |novel AS (
      |  SELECT b.doc, CAST(COUNT(*) AS BIGINT) AS n_novel
      |  FROM bsh b LEFT JOIN landed l ON b.shingle = l.shingle
      |  WHERE l.shingle IS NULL
      |  GROUP BY b.doc),
      |tot AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM bsh GROUP BY doc)
      |SELECT t.doc AS doc_id, t.n_shingles,
      |  COALESCE(n.n_novel, 0) AS n_novel,
      |  round(CAST(COALESCE(n.n_novel, 0) AS DOUBLE)
      |    / CAST(t.n_shingles AS DOUBLE), 6) AS novelty
      |FROM tot t LEFT JOIN novel n ON t.doc = n.doc""".stripMargin))

  /** q161: LSH band planning ([[graft.dedup.Dedup.lshPlan]]) — the
    * S-curve error table that justifies a (bands, rows) choice for a
    * permutation budget before any corpus is hashed. e9-floored grid
    * probabilities make both areas exact integer sums, so the full
    * ranking (not just the winner) hash-matches the oracle. */
  val q161 = GQuery(
    "q161_lsh_band_plan",
    (s, _) => Dedup.lshPlan(s, nPerms = 64, thresholdsPct = Seq(50, 60, 70, 80)),
    Some("""WITH cfg AS (
      |  SELECT b, CAST(64 // b AS INT) AS r
      |  FROM (SELECT UNNEST([1, 2, 4, 8, 16, 32, 64]) AS b)),
      |th AS (SELECT UNNEST([50, 60, 70, 80]) AS t_pct),
      |p AS (
      |  SELECT t_pct, b, r, g.i,
      |    CAST(FLOOR((1 - pow(1 - pow(g.i / 100.0, r), b)) * 1000000000) AS BIGINT)
      |      AS p_e9
      |  FROM cfg, th, UNNEST(generate_series(1, 99)) AS g(i)),
      |a AS (
      |  SELECT t_pct, b, r,
      |    CAST(SUM(CASE WHEN i < t_pct THEN p_e9 ELSE 0 END) // 100 AS BIGINT) AS fp_e9,
      |    CAST(SUM(CASE WHEN i >= t_pct THEN 1000000000 - p_e9 ELSE 0 END) // 100
      |      AS BIGINT) AS fn_e9
      |  FROM p GROUP BY t_pct, b, r)
      |SELECT t_pct, b, r, fp_e9, fn_e9, fp_e9 + fn_e9 AS cost_e9,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY t_pct ORDER BY fp_e9 + fn_e9, b)
      |    AS BIGINT) AS rn
      |FROM a""".stripMargin))

  /** q162: preference-pair mining over near-dup clusters — reward-model
    * training data from the same cluster map q118 adjudicates: within
    * each cluster the best-quality member (token count, ties to the
    * smaller id — the q118 election) is the CHOSEN response and every
    * member at least `minMargin` tokens worse is a REJECTED partner;
    * near-duplicate framing guarantees the pair is about the same
    * content, so the margin reflects quality, not topic. One
    * component-keyed window over the cluster map — the iterative work
    * all lives in the connected-components step. */
  val q162 = GQuery(
    "q162_preference_pairs",
    (s, d) => {
      val docs = documents(s, d)
      val toks = docs.select(col("doc_id"),
        size(graft.text.TextFunctions.wsTokens(col("text"))).cast("long").as("n_tokens"))
      val comp = ngramComp02(s, d, probe = true)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("component"))
        .orderBy(col("n_tokens").desc, col("doc_id").asc)
      val ranked = comp.join(toks, comp("node") === toks("doc_id"))
        .select(col("component"), col("doc_id"), col("n_tokens"))
        .withColumn("rn", row_number().over(w))
      val best = ranked.filter(col("rn") === 1)
        .select(col("component"), col("doc_id").as("chosen_id"),
          col("n_tokens").as("__ct"))
      ranked.filter(col("rn") > 1)
        .join(best, Seq("component"))
        .filter(col("__ct") - col("n_tokens") >= 1)
        .select(col("component"), col("chosen_id"),
          col("doc_id").as("rejected_id"),
          (col("__ct") - col("n_tokens")).as("margin"))
    },
    Some(s"""WITH RECURSIVE $clusterCtes,
      |ranked AS (
      |  SELECT c.component, c.node AS doc_id, t.n_tokens,
      |    row_number() OVER (PARTITION BY c.component
      |                       ORDER BY t.n_tokens DESC, c.node ASC) AS rn
      |  FROM comp c JOIN toks t ON c.node = t.doc_id),
      |best AS (
      |  SELECT component, doc_id AS chosen_id, n_tokens AS ct
      |  FROM ranked WHERE rn = 1)
      |SELECT r.component, b.chosen_id, r.doc_id AS rejected_id,
      |  b.ct - r.n_tokens AS margin
      |FROM ranked r JOIN best b ON r.component = b.component
      |WHERE r.rn > 1 AND b.ct - r.n_tokens >= 1""".stripMargin))

  /** q167: asymmetric containment near-dup pairs
    * ([[Dedup.containmentPairs]]) — every 17th document contributes a
    * 12-token excerpt as a new doc, so the corpus carries genuine
    * sub-document duplication: the excerpt's 8 shingles sit entirely
    * inside its parent (containment 1.0) while the pair's Jaccard is
    * far below any usable symmetric threshold — the case q37 cannot
    * see. Same inverted-index plan shape as q37; threshold 0.9 on
    * EITHER direction. */
  val q167 = GQuery(
    "q167_containment_pairs",
    (s, d) => {
      val docs = documents(s, d)
      val excerpts = docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          array_join(slice(graft.text.TextFunctions.wsTokens(col("text")), 1, 12), " ")
            .as("text"))
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(excerpts)
      Dedup.containmentPairs(corpus, "doc_id", "text", k = 5, threshold = 0.9)
        .select(col("da"), col("db"), col("common"), col("na"), col("nb"),
          round(col("containment_a"), 6).as("containment_a"),
          round(col("containment_b"), 6).as("containment_b"))
    },
    Some(s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 5000000,
      |    array_to_string(($wsSql)[1:12], ' ')
      |  FROM documents WHERE doc_id % 17 = 0),
      |shc AS (
      |  SELECT DISTINCT doc_id AS doc,
      |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS shingle
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM corpus) t,
      |    UNNEST(generate_series(1, greatest(len(ws) - 4, 0))) AS u(i)),
      |sizesc AS (SELECT doc, COUNT(*) AS n_shingles FROM shc GROUP BY doc),
      |pairs AS (
      |  SELECT a.doc AS da, b.doc AS db, COUNT(*) AS common
      |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
      |  GROUP BY 1, 2)
      |SELECT p.da, p.db, p.common, sa.n_shingles AS na, sb.n_shingles AS nb,
      |  round(CAST(p.common AS DOUBLE) / CAST(sa.n_shingles AS DOUBLE), 6) AS containment_a,
      |  round(CAST(p.common AS DOUBLE) / CAST(sb.n_shingles AS DOUBLE), 6) AS containment_b
      |FROM pairs p
      |JOIN sizesc sa ON p.da = sa.doc JOIN sizesc sb ON p.db = sb.doc
      |WHERE greatest(CAST(p.common AS DOUBLE) / CAST(sa.n_shingles AS DOUBLE),
      |  CAST(p.common AS DOUBLE) / CAST(sb.n_shingles AS DOUBLE)) >= 0.9""".stripMargin))

  /** q180: component-aware splits — the CONSTRUCTIVE fix for the
    * leakage q108 measures: split membership is drawn on the near-dup
    * COMPONENT id (q57's clusters; singletons are their own
    * component), so a whole duplicate family lands in one split and
    * cross-split near-dup pairs are zero BY CONSTRUCTION — which the
    * gate pins (n_cross carried on every row, hash-checked at 0),
    * alongside the per-split doc/component/char census. One extra
    * column on the component map; the draw is the q100 md5 unit
    * convention on the component id. */
  val q180 = {
    val splitSpec = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    GQuery(
      "q180_component_split",
      (s, d) => {
        import graft.operators.Splits
        val docs = documents(s, d)
        // pairs feed the leak audit, comp the split map — both probed
        // from the q118 landings (pinned there, no local pin needed)
        val pairs = ngramPairs02(s, d, probe = true)
        val comp = ngramComp02(s, d, probe = true)
        val assigned = Splits.assignSplit(
            docs.select(col("doc_id"), col("n_chars"))
              .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
              .withColumn("component", coalesce(col("component"), col("doc_id"))),
            col("component"), splitSpec)
          .localCheckpoint(eager = false)
        val sa = assigned.select(col("doc_id").as("da"), col("split").as("split_a"))
        val sb = assigned.select(col("doc_id").as("db"), col("split").as("split_b"))
        val leak = pairs.join(sa, "da").join(sb, "db")
          .agg(
            sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L)).as("n_cross"),
            lcount(lit(1)).as("n_pairs_total"))
        assigned.groupBy(col("split"))
          .agg(
            lcount(lit(1)).as("n_docs"),
            countDistinct(col("component")).cast("long").as("n_components"),
            sum(col("n_chars")).as("n_chars"))
          .crossJoin(broadcast(leak))
      },
      Some {
        val th = graft.operators.Splits.cumThresholds(splitSpec)
        val splitCase = "CASE " + th.init.map { case (n, ub) =>
          s"WHEN u_split < $ub THEN '$n'"
        }.mkString(" ") + s" ELSE '${th.last._1}' END"
        s"""WITH RECURSIVE $clusterCtes,
          |wc AS (
          |  SELECT d.doc_id, d.n_chars,
          |    COALESCE(c.component, d.doc_id) AS component
          |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
          |sp AS (
          |  SELECT doc_id, n_chars, component, $splitCase AS split
          |  FROM (
          |    SELECT *,
          |      CAST(('0x' || substr(md5('split-' || CAST(component AS VARCHAR)), 1, 7)) AS BIGINT)
          |        / 268435456.0 AS u_split
          |    FROM wc) t),
          |leak AS (
          |  SELECT
          |    CAST(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
          |    COUNT(*) AS n_pairs_total
          |  FROM jp JOIN sp a ON jp.da = a.doc_id JOIN sp b ON jp.db = b.doc_id)
          |SELECT sp.split, COUNT(*) AS n_docs,
          |  CAST(COUNT(DISTINCT sp.component) AS BIGINT) AS n_components,
          |  CAST(SUM(sp.n_chars) AS BIGINT) AS n_chars,
          |  leak.n_cross, leak.n_pairs_total
          |FROM sp CROSS JOIN leak
          |GROUP BY sp.split, leak.n_cross, leak.n_pairs_total""".stripMargin
      })
  }

  /** q212: distributed suffix-array ranks by prefix doubling
    * ([[graft.text.SuffixArray]]) — the index Lee et al. 2021 build
    * for substring-level dedup, here over a windowed doc sample (first
    * 200 chars, every 17th doc). The oracle is the DEFINITION: DuckDB
    * dense-ranks the raw suffix strings directly, so every rank the
    * log-round doubling algorithm produces — including dense ties for
    * identical cross-doc suffixes — is checked against a first-
    * principles suffix sort. */
  /** The %17-sample SA index all four in-sample SA queries share:
    * q212 LANDS it ([[graft.core.Landed]]; the string-carrying
    * [[graft.text.SuffixArray.index]] form, so it is EXTENDABLE),
    * q216/q221 PROBE its ranks, and q223 probes AND EXTENDS it with
    * the benchmark excerpts — the doubling rounds run once per
    * suite, not four times. */
  private def sa17Sample(s: org.apache.spark.sql.SparkSession, d: String) =
    documents(s, d)
      .filter(col("doc_id") % 17 === 0)
      .select(col("doc_id"), col("text"))

  private def sa17Index(s: org.apache.spark.sql.SparkSession, d: String,
                        probe: Boolean) = {
    def build = graft.text.SuffixArray.index(
      sa17Sample(s, d), "doc_id", "text", maxChars = 200)
    if (probe) graft.core.Landed.probeOrBuild(s, s"sa-index-17-200:$d")(build)
    else graft.core.Landed.land(s, s"sa-index-17-200:$d")(build)
  }

  private def sa17Ranks(s: org.apache.spark.sql.SparkSession, d: String,
                        probe: Boolean) =
    sa17Index(s, d, probe)
      .select(col("doc_id"), col("pos"), col("rank"))

  val q212 = GQuery(
    "q212_suffix_array",
    (s, d) => sa17Ranks(s, d, probe = false),
    Some("""WITH pos AS (
      |  SELECT doc_id, CAST(s.i AS BIGINT) AS pos,
      |    substr(substr(text, 1, 200), s.i) AS suf
      |  FROM documents,
      |    UNNEST(generate_series(1, LEAST(length(text), 200))) AS s(i)
      |  WHERE doc_id % 17 = 0 AND length(text) >= 1)
      |SELECT doc_id, pos,
      |  CAST(DENSE_RANK() OVER (ORDER BY suf) AS BIGINT) AS rank
      |FROM pos""".stripMargin))

  /** q252: incremental suffix-array maintenance
    * ([[graft.text.SuffixArray.extendRanks]]) — the landed-index arm
    * the r9 verdict flagged as the ONE index without one: a landed SA
    * over 3/4 of the doc sample absorbs the remaining 1/4 as a batch
    * through a single linear merge pass (rank-insert over the
    * string-ordered union via the two-pass segmented scan), never
    * re-running the doubling rounds on landed mass. Routed through
    * [[graft.text.SuffixArray.extendOrRebuild]], the reference-style
    * compaction policy (extend small deltas, rebuild big ones —
    * `R/get-cloud-files.R:178-184`); both arms produce identical
    * ranks, and the oracle pins merge ≡ rebuild by dense-ranking the
    * UNION's raw suffix strings from first principles. */
  val q252 = GQuery(
    "q252_incremental_sa",
    (s, d) => {
      val sample = documents(s, d)
        .filter(col("doc_id") % 17 === 0)
        .select(col("doc_id"), col("text"))
      val landedDocs = sample.filter(col("doc_id") % 4 =!= 0)
      val batch = sample.filter(col("doc_id") % 4 === 0)
      val landedIdx = graft.text.SuffixArray.index(
        landedDocs, "doc_id", "text", maxChars = 200)
      graft.text.SuffixArray.extendOrRebuild(
        landedIdx, landedDocs, batch, "doc_id", "text", maxChars = 200)
    },
    Some("""WITH pos AS (
      |  SELECT doc_id, CAST(s.i AS BIGINT) AS pos,
      |    substr(substr(text, 1, 200), s.i) AS suf
      |  FROM documents,
      |    UNNEST(generate_series(1, LEAST(length(text), 200))) AS s(i)
      |  WHERE doc_id % 17 = 0 AND length(text) >= 1)
      |SELECT doc_id, pos,
      |  CAST(DENSE_RANK() OVER (ORDER BY suf) AS BIGINT) AS rank,
      |  doc_id % 4 = 0 AS is_new
      |FROM pos""".stripMargin))

  /** q216: suffix-array LCP mining ([[graft.text.SuffixArray.repeatLengths]])
    * — the load-bearing pass on top of the q212 index: every suffix's
    * maximal repeated-prefix length (max LCP with its two rank-order
    * neighbors; Lee et al. 2021's repeated-substring step), censused
    * per document against a span threshold. The oracle replays the
    * WHOLE chain from first principles: DuckDB sorts the raw suffix
    * strings, takes lag-adjacent pairs, computes each LCP as the max
    * k with equal k-prefixes (prefix equality is monotone in k, so
    * MAX over the equal set IS the LCP), folds the pair LCPs back to
    * per-position maxima, and aggregates the same census. Versus
    * q138's fixed-k-gram spans: this returns EXACT maximal repeat
    * lengths, not length-k witnesses. */
  val q216 = {
    val L = 12 // span threshold: positions whose repeat covers >= L chars
    GQuery(
      "q216_sa_lcp_mining",
      (s, d) => {
        graft.text.SuffixArray.repeatLengths(sa17Sample(s, d), "doc_id",
            "text", maxChars = 200,
            ranksOf = Some(sa17Ranks(s, d, probe = true)))
          .groupBy(col("doc_id"))
          .agg(
            lcount(lit(1)).as("n_pos"),
            sum(when(col("rep") >= L, lit(1L)).otherwise(lit(0L))).as("n_rep_pos"),
            max(col("rep")).as("max_rep_len"),
            sum(when(col("rep") >= L, col("rep")).otherwise(lit(0L)))
              .as("rep_chars"))
      },
      Some(s"""WITH pos AS (
        |  SELECT doc_id, CAST(s.i AS BIGINT) AS pos,
        |    substr(substr(text, 1, 200), s.i) AS suf
        |  FROM documents,
        |    UNNEST(generate_series(1, LEAST(length(text), 200))) AS s(i)
        |  WHERE doc_id % 17 = 0 AND length(text) >= 1),
        |ord AS (
        |  SELECT doc_id, pos, suf,
        |    row_number() OVER (ORDER BY suf, doc_id, pos) AS idx
        |  FROM pos),
        |pair AS (
        |  SELECT a.doc_id AS d1, a.pos AS p1, b.doc_id AS d2, b.pos AS p2,
        |    a.suf AS s1, b.suf AS s2
        |  FROM ord a JOIN ord b ON b.idx = a.idx + 1),
        |lcp AS (
        |  SELECT d1, p1, d2, p2,
        |    MAX(CASE WHEN substr(s1, 1, k.i) = substr(s2, 1, k.i)
        |      THEN k.i ELSE 0 END) AS l
        |  FROM pair,
        |    UNNEST(generate_series(1,
        |      GREATEST(LEAST(length(s1), length(s2)), 1))) AS k(i)
        |  GROUP BY d1, p1, d2, p2),
        |rep0 AS (
        |  SELECT d1 AS doc_id, p1 AS pos, l FROM lcp
        |  UNION ALL
        |  SELECT d2, p2, l FROM lcp),
        |rep AS (
        |  SELECT o.doc_id, o.pos, COALESCE(MAX(r.l), 0) AS rep
        |  FROM ord o LEFT JOIN rep0 r
        |    ON o.doc_id = r.doc_id AND o.pos = r.pos
        |  GROUP BY o.doc_id, o.pos)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pos,
        |  CAST(SUM(CASE WHEN rep >= $L THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_pos,
        |  CAST(MAX(rep) AS BIGINT) AS max_rep_len,
        |  CAST(SUM(CASE WHEN rep >= $L THEN rep ELSE 0 END) AS BIGINT) AS rep_chars
        |FROM rep GROUP BY doc_id""".stripMargin))
  }

  /** q221: exact-maximal-length repeated-span removal over the suffix
    * array — the full Lee et al. 2021 ExactSubstr shape composed from
    * q212's index and q216's LCPs: consecutive suffixes whose adjacent
    * LCPs all reach L share one L-prefix (LCP transitivity), so each
    * such RUN ([[graft.text.SuffixArray.prefixRuns]], a two-pass
    * distributed segmented scan — never a single-reducer window) is a
    * group of duplicate-span occurrences; the group keeps its first
    * occurrence (min packed (doc, pos)) and every other member masks
    * its shared prefix AT THE RUN'S EXACT LENGTH (min internal LCP —
    * where q138's fixed-k-gram form always excises k-token windows).
    * Masked positions merge into islands per doc and the surviving
    * characters rebuild the cleaned text. The oracle replays the whole
    * chain: suffix sort, adjacent LCPs, the boundary cumsum, run
    * aggregation, canonical election, mask explosion, islands,
    * per-char rebuild. */
  val q221 = {
    val L = 15
    GQuery(
      "q221_sa_span_dedup",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val sample = sa17Sample(s, d)
        val runs = graft.text.SuffixArray
          .prefixRuns(sample, "doc_id", "text", maxChars = 200,
            minLen = L, ranksOf = Some(sa17Ranks(s, d, probe = true)))
          .localCheckpoint(eager = false) // two consumers: agg + member join
        val agg = runs.groupBy(col("run_id")).agg(
          lcount(lit(1)).as("__m"),
          min(when(!col("boundary"), col("prev_lcp"))).as("__run_len"),
          min(col("doc") * 1024 + col("pos")).as("__canon"))
        val masked = runs.join(agg, Seq("run_id"))
          .filter(col("__m") >= 2 &&
            (col("doc") * 1024 + col("pos")) =!= col("__canon"))
          .select(col("doc"),
            explode(sequence(col("pos"), col("pos") + col("__run_len") - 1))
              .as("i"))
          .distinct()
          .localCheckpoint(eager = false) // three consumers below
        val chars = sample
          .select(col("doc_id").as("doc"),
            substring(col("text"), 1, 200).as("__w"))
          .filter(length(col("__w")) >= 1)
          .select(col("doc"), col("__w"),
            explode(sequence(lit(1L), length(col("__w")).cast("long"))).as("i"))
          .select(col("doc"), col("i"),
            expr("substring(__w, CAST(i AS INT), 1)").as("c"))
        val kept = chars.join(masked, Seq("doc", "i"), "left_anti")
        val clean = kept.groupBy(col("doc")).agg(
          array_join(transform(
            array_sort(collect_list(struct(col("i"), col("c")))),
            x => x("c")), "").as("clean_text"))
        val mcount = masked.groupBy(col("doc"))
          .agg(lcount(lit(1)).as("n_masked"))
        val isl = masked
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col("doc")).orderBy(col("i"))))
          .groupBy(col("doc"))
          .agg(countDistinct(col("i") - col("__rn")).as("n_islands"))
        chars.groupBy(col("doc")).agg(lcount(lit(1)).as("n_chars"))
          .join(mcount, Seq("doc"), "left")
          .join(isl, Seq("doc"), "left")
          .join(clean, Seq("doc"), "left")
          .select(col("doc").as("doc_id"), col("n_chars"),
            coalesce(col("n_masked"), lit(0L)).as("n_masked"),
            coalesce(col("n_islands"), lit(0L)).as("n_islands"),
            coalesce(col("clean_text"), lit("")).as("clean_text"))
      },
      Some(s"""WITH pos AS (
        |  SELECT doc_id, CAST(s.i AS BIGINT) AS pos,
        |    substr(substr(text, 1, 200), s.i) AS suf
        |  FROM documents,
        |    UNNEST(generate_series(1, LEAST(length(text), 200))) AS s(i)
        |  WHERE doc_id % 17 = 0 AND length(text) >= 1),
        |ord AS (
        |  SELECT doc_id, pos, suf,
        |    row_number() OVER (ORDER BY suf, doc_id, pos) AS idx
        |  FROM pos),
        |pl AS (
        |  SELECT b.idx,
        |    MAX(CASE WHEN substr(a.suf, 1, k.i) = substr(b.suf, 1, k.i)
        |      THEN k.i ELSE 0 END) AS l
        |  FROM ord a JOIN ord b ON b.idx = a.idx + 1,
        |    UNNEST(generate_series(1,
        |      GREATEST(LEAST(length(a.suf), length(b.suf)), 1))) AS k(i)
        |  GROUP BY b.idx),
        |rn AS (
        |  SELECT o.doc_id, o.pos, o.idx, pl.l AS prev_lcp,
        |    CASE WHEN pl.l IS NULL OR pl.l < $L THEN 1 ELSE 0 END AS b
        |  FROM ord o LEFT JOIN pl ON o.idx = pl.idx),
        |rr AS (
        |  SELECT *, SUM(b) OVER (ORDER BY idx ROWS UNBOUNDED PRECEDING)
        |    AS run_id
        |  FROM rn),
        |ra AS (
        |  SELECT run_id, COUNT(*) AS m,
        |    MIN(CASE WHEN b = 0 THEN prev_lcp END) AS run_len,
        |    MIN(doc_id * 1024 + pos) AS canon
        |  FROM rr GROUP BY run_id),
        |mk AS (
        |  SELECT DISTINCT rr.doc_id, CAST(g.i AS BIGINT) AS i
        |  FROM rr JOIN ra ON rr.run_id = ra.run_id,
        |    UNNEST(generate_series(rr.pos, rr.pos + ra.run_len - 1)) AS g(i)
        |  WHERE ra.m >= 2 AND rr.doc_id * 1024 + rr.pos <> ra.canon),
        |ch AS (
        |  SELECT doc_id, CAST(s.i AS BIGINT) AS i,
        |    substr(substr(text, 1, 200), s.i, 1) AS c
        |  FROM documents,
        |    UNNEST(generate_series(1, LEAST(length(text), 200))) AS s(i)
        |  WHERE doc_id % 17 = 0 AND length(text) >= 1),
        |keep AS (
        |  SELECT ch.doc_id, ch.i, ch.c
        |  FROM ch LEFT JOIN mk ON ch.doc_id = mk.doc_id AND ch.i = mk.i
        |  WHERE mk.i IS NULL),
        |cl AS (
        |  SELECT doc_id, string_agg(c, '' ORDER BY i) AS clean_text
        |  FROM keep GROUP BY doc_id),
        |mc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_masked
        |       FROM mk GROUP BY doc_id),
        |il AS (
        |  SELECT doc_id, CAST(COUNT(DISTINCT i - rn2) AS BIGINT) AS n_islands
        |  FROM (SELECT doc_id, i,
        |          row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn2
        |        FROM mk) t
        |  GROUP BY doc_id),
        |tt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chars
        |       FROM ch GROUP BY doc_id)
        |SELECT tt.doc_id, tt.n_chars,
        |  COALESCE(mc.n_masked, 0) AS n_masked,
        |  COALESCE(il.n_islands, 0) AS n_islands,
        |  COALESCE(cl.clean_text, '') AS clean_text
        |FROM tt
        |LEFT JOIN mc ON tt.doc_id = mc.doc_id
        |LEFT JOIN il ON tt.doc_id = il.doc_id
        |LEFT JOIN cl ON tt.doc_id = cl.doc_id""".stripMargin))
  }

  /** q223: exact-substring CONTAMINATION localization over the suffix
    * array — the cross-corpus face of q221 and the exact-length
    * upgrade of q123's winnowed fingerprints: benchmark excerpts and
    * training docs index into ONE suffix order (benchmark ids
    * negated), and any shared-prefix run ([[graft.text.SuffixArray.prefixRuns]])
    * containing BOTH sides marks its training members' positions for
    * the run's exact shared length. Where fingerprint matching
    * witnesses fixed-size windows, this reports each leak at the
    * true matched length — the number a decontamination policy
    * thresholds on. The benchmark fixture is planted by construction
    * (every %51 doc is a %17 doc, so its excerpt occurs verbatim in
    * the training sample) and the oracle replays the whole chain. */
  val q223 = {
    val L = 20
    GQuery(
      "q223_sa_contamination",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val train = documents(s, d)
          .filter(col("doc_id") % 17 === 0)
          .select(col("doc_id"), col("text"))
        // benchmark = 60-char excerpts of every 51st doc (51 = 3·17,
        // so each excerpt's source doc IS in the training sample);
        // negative ids tag the side through the shared index
        val bench = documents(s, d)
          .filter(col("doc_id") % 51 === 0)
          .select((-col("doc_id") - 1).as("doc_id"),
            substring(col("text"), 41, 60).as("text"))
          .filter(length(col("text")) >= 1)
        // the production shape of contamination screening: the corpus
        // SA is a LANDED index; the newly-arrived benchmark extends
        // it through the linear merge (extendRanks, merge == rebuild)
        // instead of re-running the doubling over corpus mass
        val merged = graft.text.SuffixArray
          .extendRanks(sa17Index(s, d, probe = true), bench,
            "doc_id", "text", maxChars = 200)
          .select(col("doc_id"), col("pos"), col("rank"))
        val runs = graft.text.SuffixArray
          .prefixRuns(train.unionByName(bench), "doc_id", "text",
            maxChars = 200, minLen = L, ranksOf = Some(merged))
          .localCheckpoint(eager = false)
        val agg = runs.groupBy(col("run_id")).agg(
          min(when(!col("boundary"), col("prev_lcp"))).as("__run_len"),
          max(when(col("doc") < 0, lit(1)).otherwise(lit(0))).as("__has_bench"))
        val masked = runs.join(agg, Seq("run_id"))
          .filter(col("__has_bench") === 1 && col("doc") >= 0 &&
            col("__run_len").isNotNull)
          .select(col("doc"),
            explode(sequence(col("pos"), col("pos") + col("__run_len") - 1))
              .as("i"))
          .distinct()
          .localCheckpoint(eager = false)
        val chars = train
          .select(col("doc_id").as("doc"),
            substring(col("text"), 1, 200).as("__w"))
          .filter(length(col("__w")) >= 1)
          .select(col("doc"), length(col("__w")).cast("long").as("n_chars"))
        val mcount = masked.groupBy(col("doc"))
          .agg(lcount(lit(1)).as("n_contaminated"))
        val isl = masked
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col("doc")).orderBy(col("i"))))
          .groupBy(col("doc"))
          .agg(countDistinct(col("i") - col("__rn")).as("n_islands"))
        chars
          .join(mcount, Seq("doc"), "left")
          .join(isl, Seq("doc"), "left")
          .select(col("doc").as("doc_id"), col("n_chars"),
            coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
            coalesce(col("n_islands"), lit(0L)).as("n_islands"))
      },
      Some(s"""WITH pos AS (
        |  SELECT doc_id, CAST(s.i AS BIGINT) AS pos,
        |    substr(substr(text, 1, 200), s.i) AS suf
        |  FROM documents,
        |    UNNEST(generate_series(1, LEAST(length(text), 200))) AS s(i)
        |  WHERE doc_id % 17 = 0 AND length(text) >= 1
        |  UNION ALL
        |  SELECT -doc_id - 1, CAST(s.i AS BIGINT),
        |    substr(substr(substr(text, 1, 200), 41, 60), s.i)
        |  FROM documents,
        |    UNNEST(generate_series(1,
        |      LEAST(GREATEST(LEAST(length(text), 200) - 40, 0), 60))) AS s(i)
        |  WHERE doc_id % 51 = 0
        |    AND GREATEST(LEAST(length(text), 200) - 40, 0) >= 1),
        |ord AS (
        |  SELECT doc_id, pos, suf,
        |    row_number() OVER (ORDER BY suf, doc_id, pos) AS idx
        |  FROM pos),
        |pl AS (
        |  SELECT b.idx,
        |    MAX(CASE WHEN substr(a.suf, 1, k.i) = substr(b.suf, 1, k.i)
        |      THEN k.i ELSE 0 END) AS l
        |  FROM ord a JOIN ord b ON b.idx = a.idx + 1,
        |    UNNEST(generate_series(1,
        |      GREATEST(LEAST(length(a.suf), length(b.suf)), 1))) AS k(i)
        |  GROUP BY b.idx),
        |rn AS (
        |  SELECT o.doc_id, o.pos, o.idx, pl.l AS prev_lcp,
        |    CASE WHEN pl.l IS NULL OR pl.l < $L THEN 1 ELSE 0 END AS b
        |  FROM ord o LEFT JOIN pl ON o.idx = pl.idx),
        |rr AS (
        |  SELECT *, SUM(b) OVER (ORDER BY idx ROWS UNBOUNDED PRECEDING)
        |    AS run_id
        |  FROM rn),
        |ra AS (
        |  SELECT run_id,
        |    MIN(CASE WHEN b = 0 THEN prev_lcp END) AS run_len,
        |    MAX(CASE WHEN doc_id < 0 THEN 1 ELSE 0 END) AS has_bench
        |  FROM rr GROUP BY run_id),
        |mk AS (
        |  SELECT DISTINCT rr.doc_id, CAST(g.i AS BIGINT) AS i
        |  FROM rr JOIN ra ON rr.run_id = ra.run_id,
        |    UNNEST(generate_series(rr.pos, rr.pos + ra.run_len - 1)) AS g(i)
        |  WHERE ra.has_bench = 1 AND rr.doc_id >= 0
        |    AND ra.run_len IS NOT NULL),
        |tt AS (
        |  SELECT doc_id, CAST(LEAST(length(text), 200) AS BIGINT) AS n_chars
        |  FROM documents
        |  WHERE doc_id % 17 = 0 AND length(text) >= 1),
        |mc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
        |       FROM mk GROUP BY doc_id),
        |il AS (
        |  SELECT doc_id, CAST(COUNT(DISTINCT i - rn2) AS BIGINT) AS n_islands
        |  FROM (SELECT doc_id, i,
        |          row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn2
        |        FROM mk) t
        |  GROUP BY doc_id)
        |SELECT tt.doc_id, tt.n_chars,
        |  COALESCE(mc.n_contaminated, 0) AS n_contaminated,
        |  COALESCE(il.n_islands, 0) AS n_islands
        |FROM tt
        |LEFT JOIN mc ON tt.doc_id = mc.doc_id
        |LEFT JOIN il ON tt.doc_id = il.doc_id""".stripMargin))
  }

  /** q225: content-defined chunking dedup ([[graft.dedup.Cdc]]) — the
    * LBFS/FastCDC storage-dedup shape on token streams: boundaries
    * where the backward w=3 window hash ≡ 0 mod 8, chunks censused by
    * md5, per-document duplicated-chunk mass. Where q36 dedups whole
    * documents and q138/q221 mine repeated SPANS, CDC finds shared
    * content at stable chunk granularity — boundaries survive edits
    * outside the chunk, so two near-versions share every untouched
    * chunk. The oracle replays the full chain: token hashes, the
    * Horner lag-window, the strictly-before boundary count, ordered
    * chunk reassembly, and the global fingerprint census. */
  val q225 = GQuery(
    "q225_cdc_chunk_dedup",
    (s, d) => {
      val ch = graft.dedup.Cdc.chunks(documents(s, d), "doc_id", "text")
      graft.dedup.Cdc.dedupCensus(ch)
        .select(col("doc").as("doc_id"), col("n_chunks"), col("n_tokens"),
          col("n_dup_chunks"), col("dup_tokens"))
    },
    Some(s"""WITH toks AS (
      |  SELECT doc_id AS doc, CAST(i AS BIGINT) AS i, ws[i] AS tok,
      |    CAST(('0x' || substr(md5(ws[i]), 1, 7)) AS BIGINT) AS h
      |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, len(ws))) AS u(i)),
      |gh AS (
      |  SELECT doc, i, tok,
      |    ((h * 1000003 + lag(h, 1) OVER wd) % 2147483647
      |      * 1000003 + lag(h, 2) OVER wd) % 2147483647 AS gh
      |  FROM toks WINDOW wd AS (PARTITION BY doc ORDER BY i)),
      |bnd AS (
      |  SELECT doc, i, tok,
      |    CASE WHEN gh IS NOT NULL AND gh % 8 = 0 THEN 1 ELSE 0 END AS b
      |  FROM gh),
      |chk AS (
      |  SELECT doc, i, tok,
      |    COALESCE(SUM(b) OVER (PARTITION BY doc ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
      |  FROM bnd),
      |ch AS (
      |  SELECT doc, chunk, CAST(COUNT(*) AS BIGINT) AS n_toks,
      |    md5(string_agg(tok, ' ' ORDER BY i)) AS fp
      |  FROM chk GROUP BY doc, chunk),
      |g AS (SELECT fp, COUNT(*) AS cnt FROM ch GROUP BY fp)
      |SELECT c.doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |  CAST(SUM(c.n_toks) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN g.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_chunks,
      |  CAST(SUM(CASE WHEN g.cnt > 1 THEN c.n_toks ELSE 0 END) AS BIGINT)
      |    AS dup_tokens
      |FROM ch c JOIN g ON c.fp = g.fp
      |GROUP BY c.doc""".stripMargin),
    headline = true)

  /** q229: incremental CDC ([[graft.dedup.Cdc]] in the q88/q133
    * landed-index discipline): the batch (doc_id % 3 = 0) chunks
    * itself, probes the LANDED corpus's distinct chunk-fingerprint
    * index, and reports per batch doc how much of its token mass is
    * already landed — the production arm of q225: at scale the chunk
    * index is storage-resident (partitioned by fingerprint), the probe
    * is one semi-join-shaped left join, and the landed corpus is never
    * re-chunked per batch. A doc whose landed mass reaches half its
    * tokens is verdicted mostly_dup (the near-version case CDC exists
    * to catch: shared chunks survive edits elsewhere in the doc). */
  val q229 = GQuery(
    "q229_incremental_cdc",
    (s, d) => {
      val docs = documents(s, d)
      val batch = graft.dedup.Cdc.chunks(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
      val landed = graft.dedup.Cdc.chunks(
          docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
        .select(col("fp")).distinct()
      batch.join(landed.withColumn("__hit", lit(1L)), Seq("fp"), "left")
        .groupBy(col("doc"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_toks")).as("n_tokens"),
          sum(when(col("__hit").isNotNull, lit(1L)).otherwise(lit(0L)))
            .as("n_landed_chunks"),
          sum(when(col("__hit").isNotNull, col("n_toks")).otherwise(lit(0L)))
            .as("landed_tokens"))
        .select(col("doc").as("doc_id"), col("n_chunks"), col("n_tokens"),
          col("n_landed_chunks"), col("landed_tokens"),
          when(col("landed_tokens") * 2 >= col("n_tokens"), lit("mostly_dup"))
            .otherwise(lit("novel")).as("verdict"))
    },
    Some(s"""WITH toks AS (
      |  SELECT doc_id AS doc, CAST(i AS BIGINT) AS i, ws[i] AS tok,
      |    CAST(('0x' || substr(md5(ws[i]), 1, 7)) AS BIGINT) AS h
      |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, len(ws))) AS u(i)),
      |gh AS (
      |  SELECT doc, i, tok,
      |    ((h * 1000003 + lag(h, 1) OVER wd) % 2147483647
      |      * 1000003 + lag(h, 2) OVER wd) % 2147483647 AS gh
      |  FROM toks WINDOW wd AS (PARTITION BY doc ORDER BY i)),
      |chk AS (
      |  SELECT doc, i, tok,
      |    COALESCE(SUM(CASE WHEN gh IS NOT NULL AND gh % 8 = 0 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc ORDER BY i
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
      |  FROM gh),
      |ch AS (
      |  SELECT doc, chunk, CAST(COUNT(*) AS BIGINT) AS n_toks,
      |    md5(string_agg(tok, ' ' ORDER BY i)) AS fp
      |  FROM chk GROUP BY doc, chunk),
      |landed AS (SELECT DISTINCT fp FROM ch WHERE doc % 3 <> 0),
      |probe AS (
      |  SELECT c.doc, c.n_toks, l.fp AS hit
      |  FROM ch c LEFT JOIN landed l ON c.fp = l.fp
      |  WHERE c.doc % 3 = 0)
      |SELECT doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_landed_chunks,
      |  CAST(SUM(CASE WHEN hit IS NOT NULL THEN n_toks ELSE 0 END) AS BIGINT)
      |    AS landed_tokens,
      |  CASE WHEN SUM(CASE WHEN hit IS NOT NULL THEN n_toks ELSE 0 END) * 2
      |         >= SUM(n_toks) THEN 'mostly_dup' ELSE 'novel' END AS verdict
      |FROM probe GROUP BY doc""".stripMargin))

  /** q230: prefix-filtered exact Jaccard pairs
    * ([[graft.dedup.Dedup.prefixJaccardPairs]], the SSJoin/PPJoin
    * candidate discipline) — same semantics as q37 at the same
    * threshold (the oracle IS q37's: exact pairs ≥ 0.6), but candidate
    * generation indexes only each doc's rarest n − ⌈0.6·n⌉ + 1
    * shingles under the global DF order, so the Zipf head never
    * self-joins. Where q37's `maxDocFreq` knob trades recall for the
    * hot-shingle blowup, prefix filtering removes the blowup and stays
    * EXACT (PrefixJaccardSpec pins output equality on this corpus). */
  val q230 = GQuery(
    "q230_prefix_jaccard",
    (s, d) =>
      Dedup.prefixJaccardPairs(documents(s, d), "doc_id", "text",
          k = 5, tNum = 3, tDen = 5)
        .select(col("da"), col("db"), col("common"), col("na"), col("nb"),
          round(col("jaccard"), 6).as("jaccard")),
    Some(s"""WITH $shingleSql,
      |pairs AS (
      |  SELECT a.doc AS da, b.doc AS db, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
      |  GROUP BY 1, 2)
      |SELECT p.da, p.db, p.common, sa.n_shingles AS na, sb.n_shingles AS nb,
      |round(CAST(p.common AS DOUBLE)
      |  / CAST(sa.n_shingles + sb.n_shingles - p.common AS DOUBLE), 6) AS jaccard
      |FROM pairs p
      |JOIN sizes sa ON p.da = sa.doc JOIN sizes sb ON p.db = sb.doc
      |WHERE CAST(p.common AS DOUBLE)
      |  / CAST(sa.n_shingles + sb.n_shingles - p.common AS DOUBLE) >= 0.6""".stripMargin))

  /** q282: Jaccard threshold-sensitivity sweep — the tuning census
    * behind every fixed-θ dedup arm (q37/q38/q57): how many candidate
    * pairs land in each Jaccard decile, and how many survive each
    * candidate threshold? One shared inverted-index pass (q37's
    * machinery at θ=0 — candidates are still bounded by shared-shingle
    * postings, never n²), then EXACT integer decile bucketing
    * `(10·common) div union` (an IEEE-rounded j·10 would wobble pairs
    * across the 0.6 boundary between engines) and an 11-row cumulative
    * window. This is the curve an operator reads before picking θ —
    * the elbow is the dedup bill. */
  val q282 = GQuery(
    "q282_jaccard_threshold_sweep",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("bucket").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Dedup.ngramJaccardPairs(documents(s, d), "doc_id", "text",
          k = 5, threshold = 0.0)
        .withColumn("bucket", expr("(common * 10) div (na + nb - common)"))
        .groupBy(col("bucket")).agg(lcount(lit(1)).as("n_pairs"))
        .withColumn("pairs_at_or_above", sum(col("n_pairs")).over(w))
    },
    Some(s"""WITH $shingleSql,
      |pairs AS (
      |  SELECT a.doc AS da, b.doc AS db, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
      |  GROUP BY 1, 2),
      |bk AS (
      |  SELECT CAST((10 * p.common) // (sa.n_shingles + sb.n_shingles - p.common)
      |      AS BIGINT) AS bucket
      |  FROM pairs p
      |  JOIN sizes sa ON p.da = sa.doc JOIN sizes sb ON p.db = sb.doc),
      |hist AS (
      |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM bk GROUP BY 1)
      |SELECT bucket, n_pairs,
      |  CAST(SUM(n_pairs) OVER (ORDER BY bucket DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS pairs_at_or_above
      |FROM hist""".stripMargin))

  /** q283: MinHash estimator calibration — per exact-Jaccard decile,
    * how far off is the 16-perm signature estimate on the LSH
    * candidate set? The QA query an operator runs before trusting
    * est_jaccard as a pre-filter (q38 verifies exactly; pipelines that
    * skip verification need this error bill). Integer under the hash:
    * est is a multiple of 1/16 and j a ratio of small ints, both
    * computed by identical IEEE steps on both engines, so the decile
    * and the e6-floored |est − j| are deterministic; per-decile MAE is
    * a truncating integer division. Same one-pass checkpointed
    * machinery as q38 (threshold 0 keeps every LSH candidate —
    * candidates stay band-bounded, never n²). */
  val q283 = GQuery(
    "q283_minhash_calibration",
    (s, d) =>
      Dedup.minhashLshPairs(documents(s, d), "doc_id", "text",
          k = 5, numPerms = 16, rowsPerBand = 4, threshold = 0.0)
        .withColumn("bucket", floor(col("jaccard") * 10).cast("long"))
        .withColumn("err_e6",
          floor(abs(col("est_jaccard") - col("jaccard")) * 1e6 + lit(0.5))
            .cast("long"))
        .groupBy(col("bucket"))
        .agg(lcount(lit(1)).as("n_pairs"), sum(col("err_e6")).as("sum_err_e6"))
        .withColumn("mae_e6", expr("sum_err_e6 div n_pairs")),
    Some(s"""WITH $shingleSql,
      |h AS (
      |  SELECT doc, p,
      |    ((2654435761 * (p + 1) % 2147483647)
      |      * CAST(('0x' || substr(md5(shingle), 1, 7)) AS BIGINT) + p) % 2147483647 AS hv
      |  FROM sh, UNNEST(generate_series(0, 15)) AS up(p)),
      |sig AS (SELECT doc, p, MIN(hv) AS minh FROM h GROUP BY doc, p),
      |bands AS (
      |  SELECT doc, p // 4 AS band,
      |    md5(string_agg(CAST(minh AS VARCHAR), '-' ORDER BY p)) AS bkey
      |  FROM sig GROUP BY doc, p // 4),
      |cand AS (
      |  SELECT DISTINCT x.doc AS da, y.doc AS db
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc < y.doc),
      |est AS (
      |  SELECT c.da, c.db,
      |    CAST(COUNT(CASE WHEN sa.minh = sb.minh THEN 1 END) AS DOUBLE) / 16 AS est_jaccard
      |  FROM cand c
      |  JOIN sig sa ON sa.doc = c.da JOIN sig sb ON sb.doc = c.db AND sa.p = sb.p
      |  GROUP BY c.da, c.db),
      |common AS (
      |  SELECT a.doc AS da, b.doc AS db, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
      |  JOIN cand c ON c.da = a.doc AND c.db = b.doc
      |  GROUP BY 1, 2),
      |pairsj AS (
      |  SELECT e.est_jaccard,
      |    CAST(COALESCE(cm.common, 0) AS DOUBLE)
      |      / CAST(sa.n_shingles + sb.n_shingles - COALESCE(cm.common, 0) AS DOUBLE)
      |      AS jaccard
      |  FROM est e
      |  LEFT JOIN common cm ON e.da = cm.da AND e.db = cm.db
      |  JOIN sizes sa ON e.da = sa.doc JOIN sizes sb ON e.db = sb.doc),
      |bk AS (
      |  SELECT CAST(floor(jaccard * 10) AS BIGINT) AS bucket,
      |    CAST(floor(abs(est_jaccard - jaccard) * 1000000.0 + 0.5) AS BIGINT)
      |      AS err_e6
      |  FROM pairsj)
      |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(err_e6) AS BIGINT) AS sum_err_e6,
      |  CAST(SUM(err_e6) // COUNT(*) AS BIGINT) AS mae_e6
      |FROM bk GROUP BY bucket""".stripMargin))

  /** q321: cross-source duplication matrix — WHICH sources copy from
    * which (syndication networks, mirror farms): per source pair, the
    * count of distinct word 5-shingles both carry and the overlap
    * coefficient shared/min(|A|,|B|) as exact ppm. Where q103's KMV
    * census SKETCHES cross-corpus overlap, this is the exact
    * source-grain answer: shingles collapse to the (source, shingle)
    * grain first (the fact-sized work — one distinct shuffle), a
    * DF cap drops shingles in > 10 sources (boilerplate head — at
    * real source counts an uncapped postings self-join is quadratic
    * in sources-per-shingle; the cap is the q37 inverted-index
    * discipline), and the pair join runs per shingle over the capped
    * postings. Matrix rows are |sources|²-bounded. */
  val q321 = GQuery(
    "q321_cross_source_dup",
    (s, d) => {
      val sh = documents(s, d)
        .select(col("source"),
          explode(graft.text.TextFunctions.shingles(
            graft.text.TextFunctions.wsTokens(col("text")), 5)).as("shingle"))
        .distinct()
        .localCheckpoint(eager = false) // sizes + capped postings
      val sizes = sh.groupBy(col("source"))
        .agg(lcount(lit(1)).as("n_sh"))
      val capped = sh.groupBy(col("shingle"))
        .agg(lcount(lit(1)).as("df"))
        .filter(col("df") <= 10)
      val posts = sh.join(capped.select(col("shingle")), Seq("shingle"))
      val pairs = posts.select(col("shingle"), col("source").as("sa"))
        .join(posts.select(col("shingle"), col("source").as("sb")),
          Seq("shingle"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(lcount(lit(1)).as("shared"))
      pairs
        .join(broadcast(sizes.toDF("sa", "na")), Seq("sa"))
        .join(broadcast(sizes.toDF("sb", "nb")), Seq("sb"))
        .select(col("sa"), col("sb"), col("shared"), col("na"), col("nb"),
          expr("(shared * 1000000) div least(na, nb)").as("overlap_ppm"))
        .orderBy(col("sa"), col("sb"))
    },
    Some(s"""WITH sh AS MATERIALIZED (
      |  SELECT DISTINCT source,
      |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS shingle
      |  FROM (SELECT source, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, greatest(len(ws) - 4, 0))) AS u(i)),
      |sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh
      |  FROM sh GROUP BY source),
      |capped AS (
      |  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10),
      |posts AS (
      |  SELECT sh.source, sh.shingle FROM sh JOIN capped USING (shingle)),
      |pairs AS (
      |  SELECT a.source AS sa, b.source AS sb, CAST(COUNT(*) AS BIGINT) AS shared
      |  FROM posts a JOIN posts b ON a.shingle = b.shingle AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT p.sa, p.sb, p.shared, za.n_sh AS na, zb.n_sh AS nb,
      |  (p.shared * 1000000) // least(za.n_sh, zb.n_sh) AS overlap_ppm
      |FROM pairs p JOIN sizes za ON p.sa = za.source
      |JOIN sizes zb ON p.sb = zb.source
      |ORDER BY p.sa, p.sb""".stripMargin))

  /** q362: greedy maximum-coverage selection (the 1−1/e-approximate
    * submodular greedy, Nemhauser et al. 1978) — coverage-based data
    * selection: pick the 5 corpus documents that together cover the
    * most distinct bigram shingles of a TARGET set (doc_id % 101 = 0 — an
    * eval-set-alignment selection, the shape behind coverage-driven
    * fine-tuning-data picks). Each round re-scores candidates against
    * the not-yet-covered remainder (anti-join on the landed
    * candidate→target postings) and takes the argmax with a (gain,
    * doc) tie-break; cumulative coverage is the RUNNING SUM of gains
    * (each gain counts only NEW shingles — submodularity does the
    * bookkeeping). Five bounded rounds over landed postings; the
    * oracle unrolls all five with NOT IN covered sets. */
  val q362 = {
    val K = 5
    GQuery(
      "q362_greedy_cover",
      (s, d) => {
        val idx = Dedup.shingleIndex(documents(s, d), "doc_id", "text",
            k = 2, maxDocFreq = 0L)
          .localCheckpoint(eager = true) // target + candidates derive from it
        val target = idx.filter(col("doc") % 101 === 0)
          .select(col("shingle")).distinct()
        val cand = idx.filter(col("doc") % 101 =!= 0)
          .join(target, Seq("shingle"), "left_semi")
          .localCheckpoint(eager = true) // K rounds probe it
        val tsize = target.agg(count(lit(1)).cast("long").as("n_target"))
        var covered = cand.select(col("shingle")).limit(0)
        val picks = (1 to K).map { r =>
          val gains = cand.join(covered, Seq("shingle"), "left_anti")
            .groupBy(col("doc")).agg(count(lit(1)).cast("long").as("gain"))
          val pick = gains.orderBy(col("gain").desc, col("doc").asc).limit(1)
            .localCheckpoint(eager = false) // covered + output probe it
          covered = covered.unionByName(
              cand.join(broadcast(pick.select(col("doc"))), Seq("doc"),
                "left_semi").select(col("shingle")))
            .distinct()
            .localCheckpoint(eager = false)
          pick.withColumn("round", lit(r.toLong))
        }
        val W = org.apache.spark.sql.expressions.Window
        picks.reduce(_ unionByName _)
          .withColumn("covered_cum", sum(col("gain")).over(
            W.orderBy(col("round"))
              .rowsBetween(W.unboundedPreceding, W.currentRow)))
          .crossJoin(broadcast(tsize))
          .select(col("round"), col("doc").as("doc_id"), col("gain"),
            col("covered_cum"),
            expr("(covered_cum * 1000000) div n_target").as("coverage_ppm"))
          .orderBy(col("round"))
      },
      Some {
        def round(k: Int): String = {
          val notIn =
            if (k == 1) ""
            else s"WHERE shingle NOT IN (SELECT shingle FROM cov${k - 1})"
          val cov =
            if (k == 1)
              s"""cov1 AS (
                 |  SELECT shingle FROM cp
                 |  WHERE doc = (SELECT doc FROM p1))""".stripMargin
            else
              s"""cov$k AS (
                 |  SELECT shingle FROM cov${k - 1}
                 |  UNION
                 |  SELECT shingle FROM cp
                 |  WHERE doc = (SELECT doc FROM p$k))""".stripMargin
          s"""g$k AS (
             |  SELECT doc, CAST(COUNT(*) AS BIGINT) AS gain FROM cp
             |  $notIn GROUP BY doc),
             |p$k AS (SELECT doc, gain FROM g$k
             |  ORDER BY gain DESC, doc ASC LIMIT 1),
             |$cov""".stripMargin
        }
        s"""WITH sh AS (
           |  SELECT DISTINCT doc_id AS doc, ws[i] || ' ' || ws[i+1] AS shingle
           |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
           |    UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)),
           |tgt AS (SELECT DISTINCT shingle FROM sh WHERE doc % 101 = 0),
           |cp AS (
           |  SELECT s.doc, s.shingle FROM sh s
           |  JOIN tgt t ON s.shingle = t.shingle
           |  WHERE s.doc % 101 <> 0),
           |ts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_target FROM tgt),
           |${(1 to K).map(round).mkString(",\n")},
           |sel AS (
           |  ${(1 to K).map(k =>
                s"SELECT CAST($k AS BIGINT) AS round, doc, gain FROM p$k")
                .mkString("\n  UNION ALL\n  ")})
           |SELECT s2.round, s2.doc AS doc_id, s2.gain,
           |  CAST(SUM(s2.gain) OVER (ORDER BY s2.round
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS covered_cum,
           |  (CAST(SUM(s2.gain) OVER (ORDER BY s2.round
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) * 1000000)
           |    // ts.n_target AS coverage_ppm
           |FROM sel s2 CROSS JOIN ts ORDER BY s2.round""".stripMargin
      })
  }

  /** q348: Merkle partition fingerprints — the SCALABLE face of
    * q125's row-level snapshot diff: instead of joining two versions
    * row by row, each partition publishes one order-independent
    * digest (md5 over its SORTED row hashes), and a version diff
    * compares #partitions digests to localize every change — the
    * structure differential sync / lakehouse manifest validation is
    * built on. Versions here: v2 rewrites the text of doc_id % 97 = 0
    * docs; partitions are doc_id ÷ 500 ranges. The census reports the
    * resync amplification (rows shipped at partition grain vs rows
    * actually changed) — the metric that sizes the partition grain.
    * Two scans + two partition-bounded digests; sort_array inside the
    * group keeps the digest independent of row arrival order (exactly
    * what a 1000-executor shuffle needs). */
  val q348 = GQuery(
    "q348_merkle_partition_diff",
    (s, d) => {
      def digests(df: org.apache.spark.sql.DataFrame) = df
        .select(expr("doc_id div 500").as("p"),
          md5(concat_ws("|", col("doc_id"), col("text"))).as("h"),
          lit(1L).as("one"))
        .groupBy(col("p"))
        .agg(md5(concat_ws("",
          expr("array_sort(collect_list(h))"))).as("digest"),
          sum(col("one")).as("n_rows"))
      val v1 = documents(s, d).select(col("doc_id"), col("text"))
      val v2 = documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 97 === 0, upper(col("text")))
          .otherwise(col("text")).as("text"))
      val d1 = digests(v1)
      val d2 = digests(v2)
      val changedRows = v1.filter(col("doc_id") % 97 === 0
          && upper(col("text")) =!= col("text"))
        .agg(lcount(lit(1)).as("n_rows_changed"))
      d1.join(d2.select(col("p"), col("digest").as("digest2")), Seq("p"))
        .agg(lcount(lit(1)).as("n_partitions"),
          coalesce(sum(when(col("digest") =!= col("digest2"), 1L)), lit(0L))
            .as("n_changed_partitions"),
          coalesce(sum(when(col("digest") =!= col("digest2"), col("n_rows"))),
            lit(0L)).as("rows_to_resync"))
        .crossJoin(broadcast(changedRows))
        .select(col("n_partitions"), col("n_changed_partitions"),
          col("rows_to_resync"), col("n_rows_changed"),
          expr("""CASE WHEN n_rows_changed > 0
            |THEN (rows_to_resync * 1000000) div n_rows_changed
            |END""".stripMargin).as("amplification_ppm"))
    },
    Some("""WITH v1 AS (
      |  SELECT doc_id, text FROM documents),
      |v2 AS (
      |  SELECT doc_id, CASE WHEN doc_id % 97 = 0 THEN upper(text)
      |    ELSE text END AS text FROM documents),
      |d1 AS (
      |  SELECT doc_id // 500 AS p,
      |    md5(string_agg(md5(CAST(doc_id AS VARCHAR) || '|' || text), ''
      |      ORDER BY md5(CAST(doc_id AS VARCHAR) || '|' || text))) AS digest,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM v1 GROUP BY 1),
      |d2 AS (
      |  SELECT doc_id // 500 AS p,
      |    md5(string_agg(md5(CAST(doc_id AS VARCHAR) || '|' || text), ''
      |      ORDER BY md5(CAST(doc_id AS VARCHAR) || '|' || text))) AS digest
      |  FROM v2 GROUP BY 1),
      |ch AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_changed FROM v1
      |  WHERE doc_id % 97 = 0 AND upper(text) <> text),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_partitions,
      |    COALESCE(CAST(SUM(CASE WHEN d1.digest <> d2.digest THEN 1 END)
      |      AS BIGINT), 0) AS n_changed_partitions,
      |    COALESCE(CAST(SUM(CASE WHEN d1.digest <> d2.digest THEN d1.n_rows
      |      END) AS BIGINT), 0) AS rows_to_resync
      |  FROM d1 JOIN d2 ON d1.p = d2.p)
      |SELECT a.n_partitions, a.n_changed_partitions, a.rows_to_resync,
      |  c.n_rows_changed,
      |  CASE WHEN c.n_rows_changed > 0
      |    THEN (a.rows_to_resync * 1000000) // c.n_rows_changed
      |  END AS amplification_ppm
      |FROM agg a CROSS JOIN ch c""".stripMargin))

  def queries: Seq[GQuery] = Seq(q36, q37, q38, q39, q57, q61, q88, q90, q103, q108, q118, q123, q124, q125, q127, q129, q133, q138, q142, q161, q162, q167, q180, q212, q216, q221, q223, q225, q229, q230, q252, q282, q283, q321, q348, q362)
}
