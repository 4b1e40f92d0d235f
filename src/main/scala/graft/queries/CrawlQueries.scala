package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.dedup.Dedup
import graft.text.Urls

/** Crawl-side curation surface: URL canonicalization + snapshot
  * dedup, edit-distance-verified near-dups, and the Unicode-script
  * census — the stages that run against a raw web crawl BEFORE the
  * content pipeline (q111/q141). Every query carries a full SQL
  * mirror: the canonicalizer and the script counters are Java∩RE2
  * regex expressions, and the edit-distance verify uses the
  * Levenshtein both engines implement exactly.
  */
object CrawlQueries {

  /** q143: URL canonicalization + keep-latest crawl dedup. The corpus
    * has no URL column, so the fixture synthesizes six spellings per
    * document — `www.`/case/default-port/trailing-slash/tracking-param/
    * param-order chrome over a shared stem — such that five residues
    * collapse onto one https canonical and one (http) keeps its own
    * group. Keep-latest takes the newest crawl_ts (= doc_id) per
    * canonical. Census per source pins the raw rows, the distinct
    * canonical spellings, the kept winners, their id mass, and an
    * md5-prefix checksum of every canonical byte. */
  val q143 = GQuery(
    "q143_url_canonical_dedup",
    (s, d) => {
      val k = (col("doc_id") % 40).cast("string")
      val j = (col("doc_id") % 25).cast("string")
      val m = col("doc_id") % 6
      val url =
        when(m === 0, concat(lit("https://www.example-"), k, lit(".com/page/"), j,
          lit("?b=2&a=1&utm_source=x")))
        .when(m === 1, concat(lit("HTTPS://EXAMPLE-"), k, lit(".COM:443/page/"), j,
          lit("?a=1&b=2#frag")))
        .when(m === 2, concat(lit("https://example-"), k, lit(".com/page/"), j,
          lit("/?a=1&utm_campaign=c&b=2")))
        .when(m === 3, concat(lit("https://example-"), k, lit(".com/page/"), j,
          lit("?a=1&b=2&gclid=zzz")))
        .when(m === 4, concat(lit("http://example-"), k, lit(".com:80/page/"), j,
          lit("?a=1&b=2")))
        .otherwise(concat(lit("https://example-"), k, lit(".com/page/"), j,
          lit("?a=1&b=2&fbclid=q")))
      val crawl = documents(s, d).select(col("doc_id"), col("source"),
        url.as("url"), col("doc_id").as("crawl_ts"))
      val raw = crawl.withColumn("canonical_url", Urls.canonicalize(col("url")))
        .groupBy(col("source"))
        .agg(lcount(lit(1)).as("n_urls"),
          countDistinct(col("canonical_url")).as("n_groups"))
      val kept = Urls.keepLatest(crawl, "url", "crawl_ts", "doc_id")
        .groupBy(col("source"))
        .agg(lcount(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("kept_id_sum"),
          sum(col("n_crawls")).as("crawls_covered"),
          sum(conv(substring(md5(col("canonical_url")), 1, 7), 16, 10).cast("long"))
            .as("checksum"))
      raw.join(kept, Seq("source"), "left")
    },
    Some(s"""WITH c AS (
      |  SELECT doc_id, source, doc_id AS crawl_ts,
      |    CASE doc_id % 6
      |      WHEN 0 THEN 'https://www.example-' || (doc_id % 40) || '.com/page/' || (doc_id % 25) || '?b=2&a=1&utm_source=x'
      |      WHEN 1 THEN 'HTTPS://EXAMPLE-' || (doc_id % 40) || '.COM:443/page/' || (doc_id % 25) || '?a=1&b=2#frag'
      |      WHEN 2 THEN 'https://example-' || (doc_id % 40) || '.com/page/' || (doc_id % 25) || '/?a=1&utm_campaign=c&b=2'
      |      WHEN 3 THEN 'https://example-' || (doc_id % 40) || '.com/page/' || (doc_id % 25) || '?a=1&b=2&gclid=zzz'
      |      WHEN 4 THEN 'http://example-' || (doc_id % 40) || '.com:80/page/' || (doc_id % 25) || '?a=1&b=2'
      |      ELSE 'https://example-' || (doc_id % 40) || '.com/page/' || (doc_id % 25) || '?a=1&b=2&fbclid=q'
      |    END AS url
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, source, crawl_ts, url,
      |    regexp_replace(url, '#.*', '') AS base
      |  FROM c),
      |parts AS (
      |  SELECT doc_id, source, crawl_ts,
      |    lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(lower(regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)', 1)), '^www\\.', '') AS host0,
      |    regexp_replace(regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)', 1), '/$$', '') AS path,
      |    regexp_extract(base, '\\?(.*)', 1) AS qs
      |  FROM p),
      |canon AS (
      |  SELECT doc_id, source, crawl_ts,
      |    scheme || '://' ||
      |    (CASE WHEN scheme = 'http' THEN regexp_replace(host0, ':80$$', '')
      |          WHEN scheme = 'https' THEN regexp_replace(host0, ':443$$', '')
      |          ELSE host0 END) || path ||
      |    (CASE WHEN len(list_filter(string_split(qs, '&'), x -> x <> ''
      |        AND NOT regexp_matches(x, '^(?:utm_[^=&]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)='))) > 0
      |      THEN '?' || array_to_string(list_sort(list_filter(string_split(qs, '&'), x -> x <> ''
      |        AND NOT regexp_matches(x, '^(?:utm_[^=&]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)='))), '&')
      |      ELSE '' END) AS canonical_url
      |  FROM parts),
      |raw AS (
      |  SELECT source, COUNT(*) AS n_urls,
      |    COUNT(DISTINCT canonical_url) AS n_groups
      |  FROM canon GROUP BY source),
      |ranked AS (
      |  SELECT source, doc_id, canonical_url,
      |    row_number() OVER (PARTITION BY canonical_url
      |      ORDER BY crawl_ts DESC, doc_id ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY canonical_url) AS n_crawls
      |  FROM canon),
      |kept AS (
      |  SELECT source, COUNT(*) AS n_kept,
      |    CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum,
      |    CAST(SUM(n_crawls) AS BIGINT) AS crawls_covered,
      |    CAST(SUM(CAST(('0x' || substr(md5(canonical_url), 1, 7)) AS BIGINT)) AS BIGINT) AS checksum
      |  FROM ranked WHERE rn = 1 GROUP BY source)
      |SELECT r.source, r.n_urls, r.n_groups, k.n_kept, k.kept_id_sum,
      |  k.crawls_covered, k.checksum
      |FROM raw r LEFT JOIN kept k ON r.source = k.source""".stripMargin))

  /** q144: edit-distance-verified near-dup pairs
    * ([[Dedup.editDistanceNearDups]]). The fixture unions a "recrawl"
    * of every third document with its 11th character deleted — a
    * single-char edit whose shingle set still collides with the
    * original, so the inverted index proposes the pair and the
    * threshold-bounded Levenshtein verifies dist ≤ 8 exactly (the
    * corpus's natural same-topic neighbours exceed the threshold and
    * are rejected by the banded early-exit, never a full matrix). The
    * oracle replays candidates from the same shingle index and full
    * Levenshtein — Spark's −1-above-threshold encoding must agree with
    * DuckDB's unbounded distance on every surviving pair. */
  val q144 = GQuery(
    "q144_edit_distance_neardup",
    (s, d) => {
      val docs = documents(s, d)
      val recrawl = docs.filter(col("doc_id") % 3 === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
        .withColumn("text",
          concat(substring(col("text"), 1, 10), substring(col("text"), 12, 1000000)))
      val union = docs.select("doc_id", "text")
        .unionByName(recrawl.select("doc_id", "text"))
      Dedup.editDistanceNearDups(union, "doc_id", "text", k = 5, maxDist = 8)
        .groupBy()
        .agg(lcount(lit(1)).as("n_pairs"),
          sum(col("da")).as("da_sum"),
          sum(col("db")).as("db_sum"),
          sum(col("dist")).as("dist_sum"),
          max(col("dist")).as("max_dist"),
          sum(col("len_a") - col("len_b")).as("len_gap_sum"))
    },
    Some(s"""WITH u AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id,
      |    substr(text, 1, 10) || substr(text, 12) AS text
      |  FROM documents WHERE doc_id % 3 = 0),
      |sh AS (
      |  SELECT DISTINCT doc_id AS doc,
      |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS shingle
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM u) t,
      |    UNNEST(generate_series(1, greatest(len(ws) - 4, 0))) AS un(i)),
      |cand AS (
      |  SELECT DISTINCT a.doc AS da, b.doc AS db
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc),
      |v AS (
      |  SELECT c.da, c.db,
      |    length(ta.text) AS len_a, length(tb.text) AS len_b,
      |    levenshtein(ta.text, tb.text) AS dist
      |  FROM cand c JOIN u ta ON ta.doc_id = c.da JOIN u tb ON tb.doc_id = c.db
      |  WHERE abs(length(ta.text) - length(tb.text)) <= 8),
      |kept AS (SELECT * FROM v WHERE dist <= 8)
      |SELECT COUNT(*) AS n_pairs,
      |  CAST(SUM(da) AS BIGINT) AS da_sum,
      |  CAST(SUM(db) AS BIGINT) AS db_sum,
      |  CAST(SUM(dist) AS BIGINT) AS dist_sum,
      |  CAST(MAX(dist) AS BIGINT) AS max_dist,
      |  CAST(SUM(len_a - len_b) AS BIGINT) AS len_gap_sum
      |FROM kept""".stripMargin))

  /** q145: Unicode-script census — per-document counts of Latin /
    * digit / CJK / Cyrillic / Arabic / Greek characters as codegen'd
    * `regexp_count` expressions (map-only: no shuffle, no UDF, no
    * explode), censused per declared language with a script-mismatch
    * flag (non-Latin letters outnumber Latin) — the cheap pre-langid
    * screen that catches mislabelled crawl segments. The fixture
    * injects script material by doc_id residue (one residue fully
    * script-pure so the mismatch flag fires both ways); the oracle
    * counts with `regexp_extract_all` over the identical RE2∩Java
    * character classes. */
  val q145 = GQuery(
    "q145_script_census",
    (s, d) => {
      val m = col("doc_id") % 5
      val text2 =
        when(m === 0, repeat(lit("你好世界 孔子曰 學而時習之 "), 20))
        .when(m === 1, concat(lit("привет мир это тест "), col("text")))
        .when(m === 2, concat(lit("مرحبا بالعالم هذا "), col("text")))
        .when(m === 3, concat(lit("γειά σου κόσμε "), col("text")))
        .otherwise(col("text"))
      def cnt(re: String) = regexp_count(col("text2"), lit(re)).cast("long")
      val t = graft.core.Widen.widen(
          documents(s, d).select(col("lang"), text2.as("text2")))
        .withColumn("n_latin", cnt("[A-Za-z]"))
        .withColumn("n_digit", cnt("[0-9]"))
        .withColumn("n_cjk", cnt("[一-鿿]"))
        .withColumn("n_cyr", cnt("[Ѐ-ӿ]"))
        .withColumn("n_arab", cnt("[؀-ۿ]"))
        .withColumn("n_greek", cnt("[Ͱ-Ͽ]"))
        .withColumn("mismatch",
          (col("n_cjk") + col("n_cyr") + col("n_arab") + col("n_greek")) > col("n_latin"))
      t.groupBy(col("lang"))
        .agg(lcount(lit(1)).as("n_docs"),
          sum(col("n_latin")).as("latin_chars"),
          sum(col("n_digit")).as("digit_chars"),
          sum(col("n_cjk")).as("cjk_chars"),
          sum(col("n_cyr")).as("cyr_chars"),
          sum(col("n_arab")).as("arab_chars"),
          sum(col("n_greek")).as("greek_chars"),
          lcount(when(col("mismatch"), 1)).as("n_mismatch"))
    },
    Some(s"""WITH f AS (
      |  SELECT lang,
      |    CASE doc_id % 5
      |      WHEN 0 THEN repeat('你好世界 孔子曰 學而時習之 ', 20)
      |      WHEN 1 THEN 'привет мир это тест ' || text
      |      WHEN 2 THEN 'مرحبا بالعالم هذا ' || text
      |      WHEN 3 THEN 'γειά σου κόσμε ' || text
      |      ELSE text END AS t2
      |  FROM documents),
      |r AS (
      |  SELECT lang,
      |    len(regexp_extract_all(t2, '[A-Za-z]')) AS n_latin,
      |    len(regexp_extract_all(t2, '[0-9]')) AS n_digit,
      |    len(regexp_extract_all(t2, '[\\x{4e00}-\\x{9fff}]')) AS n_cjk,
      |    len(regexp_extract_all(t2, '[\\x{0400}-\\x{04ff}]')) AS n_cyr,
      |    len(regexp_extract_all(t2, '[\\x{0600}-\\x{06ff}]')) AS n_arab,
      |    len(regexp_extract_all(t2, '[\\x{0370}-\\x{03ff}]')) AS n_greek
      |  FROM f)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_latin) AS BIGINT) AS latin_chars,
      |  CAST(SUM(n_digit) AS BIGINT) AS digit_chars,
      |  CAST(SUM(n_cjk) AS BIGINT) AS cjk_chars,
      |  CAST(SUM(n_cyr) AS BIGINT) AS cyr_chars,
      |  CAST(SUM(n_arab) AS BIGINT) AS arab_chars,
      |  CAST(SUM(n_greek) AS BIGINT) AS greek_chars,
      |  COUNT(CASE WHEN n_cjk + n_cyr + n_arab + n_greek > n_latin THEN 1 END) AS n_mismatch
      |FROM r GROUP BY lang""".stripMargin))

  /** q150: per-domain census + hash-rank caps (the RefinedWeb-style
    * domain-balance pass): the crawl rolls up per registrable host
    * ([[Urls.host]]), then each domain keeps at most 20 documents by
    * deterministic md5-rank ([[graft.operators.Sampling
    * .takePerStratum]]) so no single site floods the corpus. The
    * census bills raw vs kept docs and characters per domain; the
    * oracle replays the salt-keyed rank order exactly. */
  val q150 = GQuery(
    "q150_domain_caps",
    (s, d) => {
      val url = concat(lit("https://www.site-"),
        (col("doc_id") % 12).cast("string"), lit(".org:443/d/"),
        col("doc_id").cast("string"))
      val crawl = documents(s, d).select(col("doc_id"), col("n_chars"),
          url.as("url"))
        .withColumn("domain", Urls.host(col("url")))
      val kept = graft.operators.Sampling.takePerStratum(
        crawl, Seq("domain"), col("doc_id"), n = 20, salt = "domcap")
      crawl.groupBy(col("domain"))
        .agg(lcount(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars_total"))
        .join(kept.groupBy(col("domain"))
          .agg(lcount(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("chars_kept"),
            sum(col("doc_id")).as("kept_id_sum")),
          Seq("domain"))
    },
    Some("""WITH c AS (
      |  SELECT doc_id, n_chars,
      |    'site-' || (doc_id % 12) || '.org' AS domain
      |  FROM documents),
      |ranked AS (
      |  SELECT doc_id, n_chars, domain,
      |    row_number() OVER (PARTITION BY domain ORDER BY
      |      CAST(('0x' || substr(md5('domcap-' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT),
      |      doc_id) AS rn
      |  FROM c),
      |raw AS (
      |  SELECT domain, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars_total
      |  FROM c GROUP BY domain),
      |kept AS (
      |  SELECT domain, COUNT(*) AS n_kept,
      |    CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
      |    CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
      |  FROM ranked WHERE rn <= 20 GROUP BY domain)
      |SELECT r.domain, r.n_docs, r.chars_total, k.n_kept, k.chars_kept, k.kept_id_sum
      |FROM raw r JOIN kept k ON r.domain = k.domain""".stripMargin))

  /** q151: incremental URL keep-latest ([[Urls.incrementalKeepLatest]])
    * — the batch-vs-landed-index arm of q143 (the q88/q133/q142
    * discipline): a recrawl batch is judged against the landed winner
    * index without rescanning the landed corpus. The fixture lands the
    * doc_id % 3 = 0 slice (chrome spellings over a 40-key canonical
    * space), then probes with the % 3 = 1 slice over a WIDER 56-key
    * space (batch path ids range over % 7 vs the landed % 5, so some
    * canonicals are genuinely new) with odd ids recrawling NEWER
    * (+10⁶ ts) and even ids STALE (−10⁶): new canonicals land, newer
    * recrawls displace, stale ones and batch-internal losers drop. The oracle derives every canonical
    * independently from the id arithmetic — pinning that the
    * canonicalizer maps each spelling onto the intended target. */
  val q151 = GQuery(
    "q151_incremental_url_dedup",
    (s, d) => {
      def spell(m: Column, k: Column, j: Column) =
        when(m === 0, concat(lit("https://www.site-"), k, lit(".org/p/"), j))
          .when(m === 1, concat(lit("HTTPS://SITE-"), k, lit(".ORG:443/p/"), j))
          .otherwise(concat(lit("https://site-"), k, lit(".org/p/"), j, lit("/")))
      val k = (col("doc_id") % 8).cast("string")
      val docs = documents(s, d)
      val landedCrawl = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("source"),
          spell(col("doc_id") % 3, k, (col("doc_id") % 5).cast("string")).as("url"),
          col("doc_id").as("ts"))
      val landedIdx = Urls.keepLatest(landedCrawl, "url", "ts", "doc_id")
        .select(col("canonical_url"), col("ts"), col("doc_id"))
      // the batch path key ranges over % 7 where the landed corpus only
      // covers % 5 — path ids 5 and 6 are canonicals the index has
      // never seen, exercising the n_new arm
      val batch = docs.filter(col("doc_id") % 3 === 1)
        .select(col("doc_id"), col("source"),
          spell(col("doc_id") % 2, k, (col("doc_id") % 7).cast("string")).as("url"),
          (col("doc_id") + when(col("doc_id") % 2 === 1, 1000000L)
            .otherwise(-1000000L)).as("ts"))
      Urls.incrementalKeepLatest(batch, landedIdx, "url", "ts", "doc_id")
        .groupBy(col("source"))
        .agg(
          lcount(lit(1)).as("n_batch"),
          lcount(when(col("batch_winner"), 1)).as("n_winners"),
          lcount(when(col("kept"), 1)).as("n_kept"),
          lcount(when(col("kept") && col("landed_ts").isNotNull, 1)).as("n_displaced"),
          lcount(when(col("kept") && col("landed_ts").isNull, 1)).as("n_new"),
          sum(when(col("kept"), col("doc_id"))).as("kept_id_sum"))
    },
    Some("""WITH landed AS (
      |  SELECT doc_id, doc_id AS ts,
      |    'https://site-' || (doc_id % 8) || '.org/p/' || (doc_id % 5) AS canon
      |  FROM documents WHERE doc_id % 3 = 0),
      |lw AS (
      |  SELECT canon, ts, doc_id,
      |    row_number() OVER (PARTITION BY canon ORDER BY ts DESC, doc_id ASC) AS rn
      |  FROM landed),
      |idx AS (SELECT canon, ts AS landed_ts, doc_id AS landed_id FROM lw WHERE rn = 1),
      |batch AS (
      |  SELECT doc_id, source,
      |    'https://site-' || (doc_id % 8) || '.org/p/' || (doc_id % 7) AS canon,
      |    doc_id + CASE WHEN doc_id % 2 = 1 THEN 1000000 ELSE -1000000 END AS ts
      |  FROM documents WHERE doc_id % 3 = 1),
      |bw AS (
      |  SELECT b.*,
      |    row_number() OVER (PARTITION BY canon ORDER BY ts DESC, doc_id ASC) AS rn
      |  FROM batch b),
      |v AS (
      |  SELECT bw.source, bw.doc_id, bw.rn = 1 AS batch_winner, i.landed_ts,
      |    (bw.rn = 1 AND (i.landed_ts IS NULL OR bw.ts > i.landed_ts
      |      OR (bw.ts = i.landed_ts AND bw.doc_id < i.landed_id))) AS kept
      |  FROM bw LEFT JOIN idx i ON bw.canon = i.canon)
      |SELECT source, COUNT(*) AS n_batch,
      |  COUNT(CASE WHEN batch_winner THEN 1 END) AS n_winners,
      |  COUNT(CASE WHEN kept THEN 1 END) AS n_kept,
      |  COUNT(CASE WHEN kept AND landed_ts IS NOT NULL THEN 1 END) AS n_displaced,
      |  COUNT(CASE WHEN kept AND landed_ts IS NULL THEN 1 END) AS n_new,
      |  CAST(SUM(CASE WHEN kept THEN doc_id END) AS BIGINT) AS kept_id_sum
      |FROM v GROUP BY source""".stripMargin))

  /** q172: partition-delta recompute planner — the primitive behind
    * incremental pipeline runs at 100 TB: checksum both snapshots at
    * the partition grain (source), classify each partition
    * added / removed / changed / unchanged, and emit the recompute
    * list. Downstream stages re-run ONLY `changed`+`added` partitions
    * instead of the corpus. Two map-side-combined aggregations + one
    * full outer on the partition key (|partitions| rows); the per-row
    * hash is order-independent (a sum), so the checksum is stable
    * under any partitioning. Old snapshot simulated from `documents`:
    * src19 dropped (removed), src0 withheld from old (added), every
    * doc_id%5=0 row of src3 withheld (changed). */
  val q172 = GQuery(
    "q172_partition_delta",
    (s, d) => {
      val docs = documents(s, d)
      val old = docs
        .filter(col("source") =!= "src0")
        .filter(!(col("source") === "src3" && col("doc_id") % 5 === 0))
      val neu = docs.filter(col("source") =!= "src19")
      graft.streaming.Incremental.partitionDelta(
        old, neu, "source", Seq("doc_id", "n_chars"))
    },
    Some("""WITH sig AS (
      |  SELECT source, doc_id,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(n_chars AS VARCHAR)), 1, 7)) AS BIGINT) AS rs
      |  FROM documents),
      |old AS (
      |  SELECT source, COUNT(*) AS old_rows, CAST(SUM(rs) AS BIGINT) AS old_sig
      |  FROM sig
      |  WHERE source <> 'src0' AND NOT (source = 'src3' AND doc_id % 5 = 0)
      |  GROUP BY source),
      |neu AS (
      |  SELECT source, COUNT(*) AS new_rows, CAST(SUM(rs) AS BIGINT) AS new_sig
      |  FROM sig WHERE source <> 'src19' GROUP BY source)
      |SELECT COALESCE(old.source, neu.source) AS source,
      |  COALESCE(old_rows, 0) AS old_rows,
      |  COALESCE(new_rows, 0) AS new_rows,
      |  CASE WHEN new_rows IS NULL THEN 'removed'
      |       WHEN old_rows IS NULL THEN 'added'
      |       WHEN old_sig = new_sig AND old_rows = new_rows THEN 'unchanged'
      |       ELSE 'changed' END AS status
      |FROM old FULL JOIN neu ON old.source = neu.source""".stripMargin))

  /** q184: CDC apply / MERGE upsert
    * ([[graft.streaming.Incremental.applyCdc]]) — the lakehouse kernel
    * that lands a change batch on a snapshot: per key the highest-seq
    * op wins, D deletes, I/U replaces, untouched keys pass through.
    * One key-partitioned max-seq aggregation + one full outer; the
    * snapshot is never sorted. Fixture: customer is the snapshot,
    * orders synthesize the change log (seq = o_orderkey; %7→D,
    * %3→U, else I; inserts include custkeys beyond the snapshot).
    * The gate hashes the merged state's per-segment census. */
  val q184 = GQuery(
    "q184_cdc_upsert",
    (s, d) => {
      val snap = customer(s, d).select(col("c_custkey").as("k"),
        col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"))
      val batch = orders(s, d).select(
        col("o_custkey").as("k"), col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 7 === 0, "D")
          .when(col("o_orderkey") % 3 === 0, "U").otherwise("I").as("op"),
        col("o_totalprice").as("bal"),
        concat(lit("seg"), col("o_orderkey") % 5).as("seg"))
      graft.streaming.Incremental.applyCdc(snap, batch, "k", "seq", "op")
        .groupBy(col("seg"))
        .agg(
          lcount(lit(1)).as("n_rows"),
          dsum(col("bal")).as("bal_sum"),
          sum(col("k")).as("key_sum"))
    },
    Some("""WITH b AS (
      |  SELECT o_custkey AS k, o_orderkey AS seq,
      |    CASE WHEN o_orderkey % 7 = 0 THEN 'D'
      |         WHEN o_orderkey % 3 = 0 THEN 'U' ELSE 'I' END AS op,
      |    o_totalprice AS bal, 'seg' || (o_orderkey % 5) AS seg
      |  FROM orders),
      |w AS (
      |  SELECT b.* FROM b
      |  JOIN (SELECT k, MAX(seq) AS ms FROM b GROUP BY k) m
      |    ON b.k = m.k AND b.seq = m.ms),
      |s0 AS (SELECT c_custkey AS k, c_acctbal AS bal, c_mktsegment AS seg
      |       FROM customer),
      |merged AS (
      |  SELECT COALESCE(s0.k, w.k) AS k,
      |    CASE WHEN w.k IS NOT NULL THEN w.bal ELSE s0.bal END AS bal,
      |    CASE WHEN w.k IS NOT NULL THEN w.seg ELSE s0.seg END AS seg
      |  FROM s0 FULL JOIN w ON s0.k = w.k
      |  WHERE NOT COALESCE(w.op = 'D', FALSE))
      |SELECT seg, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(bal AS DECIMAL(38,6))) AS DOUBLE) AS bal_sum,
      |  CAST(SUM(k) AS BIGINT) AS key_sum
      |FROM merged GROUP BY seg""".stripMargin))

  def queries: Seq[GQuery] = Seq(q143, q144, q145, q150, q151, q172, q184)
}
