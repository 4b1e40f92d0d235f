package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.dedup.Dedup
import graft.text.TextFunctions._

/** Text-analysis surface for training-data pipelines: token counting,
  * quality scoring, language ID and fingerprint dedup over the
  * `documents` table. All heuristics are engine-portable (token
  * equality + md5), so each query carries a full SQL oracle.
  */
object TextQueries {

  private val bpeSql = s"len(regexp_extract_all(text, '$BpeishPattern'))"
  private val wsSql = "string_split_regex(trim(text), '\\s+')"

  /** Token counting: whitespace tokens + BPE-ish lexer tokens per
    * language. */
  val q32 = GQuery(
    "q32_token_stats",
    (s, d) => {
      val t = documents(s, d).withColumn("ws", wsTokens(col("text")))
      t.groupBy(col("lang"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          sum(size(col("ws")).cast("long")).as("ws_tokens"),
          sum(bpeishCount(col("text"))).as("bpeish_tokens"),
          max(size(col("ws")).cast("long")).as("max_ws_tokens"),
          sum(col("n_chars")).as("sum_chars"))
    },
    Some(s"""SELECT lang, COUNT(*) AS n_docs,
      |CAST(SUM(len($wsSql)) AS BIGINT) AS ws_tokens,
      |CAST(SUM($bpeSql) AS BIGINT) AS bpeish_tokens,
      |CAST(MAX(len($wsSql)) AS BIGINT) AS max_ws_tokens,
      |CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY lang""".stripMargin),
    headline = true)

  /** Quality scoring: fixed-weight blend of stopword ratio, mean token
    * length and digit ratio; per-source mean score + low-quality count. */
  val q33 = GQuery(
    "q33_quality_score",
    (s, d) => {
      val t = documents(s, d).withColumn("ws", wsTokens(col("text")))
        .withColumn("score", qualityScore(col("text"), col("ws")))
      t.groupBy(col("source"))
        .agg(
          round(lavg6(col("score")), 6).as("mean_score"),
          count(when(col("score") < 0.5, lit(1))).as("n_low_quality"),
          lcount(lit(1)).as("n_docs"))
    },
    Some(s"""WITH f AS (
      |  SELECT source,
      |    0.4 * LEAST((CAST(len(list_filter($wsSql,
      |        t -> t IN ('the','a','and','of','to','in'))) AS DOUBLE)
      |      / CAST(len($wsSql) AS DOUBLE)) * 4.0, 1.0)
      |    + 0.4 * LEAST((CAST(list_sum(list_transform($wsSql, t -> length(t))) AS DOUBLE)
      |      / CAST(len($wsSql) AS DOUBLE)) / 8.0, 1.0)
      |    + 0.2 * (1.0 - LEAST((CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
      |      / CAST(length(text) AS DOUBLE)) * 10.0, 1.0)) AS score
      |  FROM documents)
      |SELECT source, round(${sqlLsum6("score")} / COUNT(score), 6) AS mean_score,
      |COUNT(CASE WHEN score < 0.5 THEN 1 END) AS n_low_quality,
      |COUNT(*) AS n_docs
      |FROM f GROUP BY source""".stripMargin))

  /** Language ID: stopword-marker argmax (deterministic tie-break on
    * language code) vs the labelled language — confusion counts. */
  val q34 = GQuery(
    "q34_langid_confusion",
    (s, d) =>
      documents(s, d)
        .withColumn("predicted", predictLang(wsTokens(col("text"))))
        .groupBy(col("lang"), col("predicted"))
        .agg(lcount(lit(1)).as("n")),
    Some(s"""WITH sc AS (
      |  SELECT lang,
      |    len(list_filter($wsSql, t -> t IN ('der','und','die','nicht'))) AS s_de,
      |    len(list_filter($wsSql, t -> t IN ('the','a','and','of'))) AS s_en,
      |    len(list_filter($wsSql, t -> t IN ('el','la','de','que'))) AS s_es,
      |    len(list_filter($wsSql, t -> t IN ('le','et','les','une'))) AS s_fr
      |  FROM documents),
      |p AS (
      |  SELECT lang,
      |    CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr) AND s_de > 0 THEN 'de'
      |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) AND s_en > 0 THEN 'en'
      |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) AND s_es > 0 THEN 'es'
      |         WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) AND s_fr > 0 THEN 'fr'
      |         ELSE 'und' END AS predicted
      |  FROM sc)
      |SELECT lang, predicted, COUNT(*) AS n FROM p GROUP BY lang, predicted""".stripMargin))

  /** Fingerprint dedup: normalized-content md5 over a corpus built from
    * two overlapping "crawls" (documents ∪ first half re-crawled) —
    * per-language total/unique/dupe counts. */
  val q35 = GQuery(
    "q35_fingerprint_dedup",
    (s, d) => {
      val docs = documents(s, d)
      val crawl2 = docs.filter(col("doc_id") < 250)
        .withColumn("source", lit("crawl2"))
      docs.unionByName(crawl2)
        .withColumn("fp", fingerprint(col("text")))
        .groupBy(col("lang"))
        .agg(
          lcount(lit(1)).as("n_rows"),
          countDistinct(col("fp")).as("n_unique"),
          (lcount(lit(1)) - countDistinct(col("fp"))).as("n_dupes"))
    },
    Some("""WITH u AS (
      |  SELECT lang, text FROM documents
      |  UNION ALL
      |  SELECT lang, text FROM documents WHERE doc_id < 250),
      |fp AS (
      |  SELECT lang, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM u)
      |SELECT lang, COUNT(*) AS n_rows, COUNT(DISTINCT fp) AS n_unique,
      |COUNT(*) - COUNT(DISTINCT fp) AS n_dupes
      |FROM fp GROUP BY lang""".stripMargin))

  /** Keyword extraction for training-data curation: per-document top-3
    * terms by TF-IDF (smoothed idf = ln((N+1)/(df+1))). The plan is the
    * inverted-index shape — explode to postings, hash-agg to (doc, term)
    * term frequencies, a term-keyed join for document frequencies — so
    * it scales as two shuffles regardless of corpus size (the df side is
    * vocabulary-sized: NOT broadcast, AQE may still choose to). Ranking
    * uses the integer surrogate (tf desc, df asc, term) — the same order
    * tfidf induces for fixed N except at float ties — so rank never
    * depends on a transcendental's last ULP; tfidf itself is reported
    * rounded. */
  val q66 = GQuery(
    "q66_tfidf_topterms",
    (s, d) => {
      val docs = documents(s, d)
      val toks = docs
        .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+")).as("term"))
        .filter(length(col("term")) >= 3)
      val tf = toks.groupBy(col("doc_id"), col("term")).agg(lcount(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(lcount(lit(1)).as("df"))
      val n = docs.agg(lcount(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)
      tf.join(dfreq, Seq("term"))
        .crossJoin(broadcast(n))
        .withColumn("term_rank", row_number().over(w))
        .filter(col("term_rank") <= 3)
        .withColumn("tfidf",
          col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))))
        .select(col("doc_id"), col("term_rank").cast("long").as("term_rank"),
          col("term"), round(col("tfidf"), 6).as("tfidf"))
    },
    Some("""WITH toks AS (
      |  SELECT doc_id, t.term
      |  FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
      |  WHERE length(t.term) >= 3),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |ranked AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |                       ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS term_rank
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, CAST(term_rank AS BIGINT) AS term_rank, term,
      |round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
      |FROM ranked WHERE term_rank <= 3""".stripMargin))

  /** q89: bigram language-model quality scoring — the batch
    * (doc_id % 3 = 0) scored by mean add-one bigram log-probability
    * under a model counted from the rest of the corpus. Scores are
    * floor-scaled e6 (ln values agree across engines well past that —
    * the existing MAD/log suite banks on the same parity). */
  val q89 = GQuery(
    "q89_bigram_logprob",
    (s, d) => {
      import graft.text.LangModel
      val docs = documents(s, d)
      val model = LangModel.train(docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
      LangModel.score(docs.filter(col("doc_id") % 3 === 0), model, "doc_id", "text")
        .select(col("doc").as("doc_id"), col("n_bigrams"),
          floor(col("logprob") * 1e6 + 0.5).cast("long").as("logprob_e6"))
    },
    Some(s"""WITH bg AS (
      |  SELECT doc_id AS doc, ws[i] AS w1, ws[i+1] AS w2
      |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)),
      |cbg AS (
      |  SELECT w1, w2, COUNT(*) AS c2 FROM bg WHERE doc % 3 <> 0 GROUP BY 1, 2),
      |toks AS (
      |  SELECT unnest($wsSql) AS w FROM documents WHERE doc_id % 3 <> 0),
      |cuni AS (SELECT w AS w1, COUNT(*) AS c1 FROM toks GROUP BY 1),
      |voc AS (SELECT COUNT(DISTINCT w) AS v FROM toks),
      |scored AS (
      |  SELECT b.doc,
      |    ln(CAST(COALESCE(g.c2, 0) + 1 AS DOUBLE) /
      |       CAST(COALESCE(u.c1, 0) + voc.v AS DOUBLE)) AS lp
      |  FROM bg b
      |  LEFT JOIN cbg g ON b.w1 = g.w1 AND b.w2 = g.w2
      |  LEFT JOIN cuni u ON b.w1 = u.w1
      |  CROSS JOIN voc
      |  WHERE b.doc % 3 = 0)
      |SELECT doc AS doc_id, COUNT(*) AS n_bigrams,
      |  CAST(floor((${graft.core.Exact.sqlLsumAt("lp", "1000000000.0")} / COUNT(*)) * 1e6 + 0.5) AS BIGINT) AS logprob_e6
      |FROM scored GROUP BY doc""".stripMargin))

  /** q91: sequence packing — documents laid into 2048-token bins by
    * shard-local contiguous fill (concat-and-chunk); per-bin census. */
  val q91 = GQuery(
    "q91_sequence_pack",
    (s, d) => {
      import graft.text.Packing
      val docs = documents(s, d)
        .withColumn("n_tok", bpeishCount(col("text")))
      val packed = Packing.pack(docs, "doc_id", "n_tok",
        capacity = 2048L, nShards = 8)
      Packing.binStats(packed, 2048L)
        .select(col("shard"), col("bin"), col("n_docs"), col("n_tokens"),
          floor(col("fill_ratio") * 1e6 + 0.5).cast("long").as("fill_e6"))
    },
    Some(s"""WITH docs AS (
      |  SELECT doc_id, CAST($bpeSql AS BIGINT) AS t,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 8 AS shard
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, shard, t,
      |    SUM(t) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - t AS start_pos
      |  FROM docs)
      |SELECT shard, CAST(start_pos // 2048 AS BIGINT) AS bin,
      |  COUNT(*) AS n_docs, CAST(SUM(t) AS BIGINT) AS n_tokens,
      |  CAST(floor((CAST(SUM(t) AS DOUBLE) / 2048) * 1e6 + 0.5) AS BIGINT) AS fill_e6
      |FROM packed GROUP BY 1, 2""".stripMargin))

  /** q94: no-straddle sequence packing (first-fit) — same sharded
    * layout as q91 but a document never crosses a bin boundary
    * ([[graft.text.Packing.packFirstFit]]). The oracle replays the
    * per-shard sequential fill as a recursive CTE (the fold is
    * non-associative, so SQL needs recursion where the engine uses a
    * per-shard scan); the per-shard aggregate pins every bin assignment
    * via the bin-weighted token sum and the offset sum. */
  val q94 = GQuery(
    "q94_sequence_pack_firstfit",
    (s, d) => {
      import graft.text.Packing
      val docs = documents(s, d)
        .withColumn("n_tok", bpeishCount(col("text")))
      Packing.packFirstFit(docs, "doc_id", "n_tok",
        capacity = 96L, nShards = 8)
        .groupBy(col("shard"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          (max(col("bin")) + 1).as("n_bins"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("bin") * col("n_tokens")).as("sum_binw"),
          sum(col("offset")).as("sum_offset"),
          count(when(col("oversize"), 1)).as("n_oversize"))
    },
    Some(s"""WITH RECURSIVE docs AS (
      |  SELECT doc_id, CAST($bpeSql AS BIGINT) AS t,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 8 AS shard
      |  FROM documents),
      |ord AS (
      |  SELECT doc_id, t, shard,
      |    row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      |  FROM docs),
      |fit AS (
      |  SELECT shard, rn, t,
      |    CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS off, t AS fill
      |  FROM ord WHERE rn = 1
      |  UNION ALL
      |  SELECT o.shard, o.rn, o.t,
      |    CASE WHEN f.fill > 0 AND f.fill + o.t > 96 THEN f.bin + 1 ELSE f.bin END,
      |    CASE WHEN f.fill > 0 AND f.fill + o.t > 96 THEN CAST(0 AS BIGINT) ELSE f.fill END,
      |    CASE WHEN f.fill > 0 AND f.fill + o.t > 96 THEN o.t ELSE f.fill + o.t END
      |  FROM fit f JOIN ord o ON o.shard = f.shard AND o.rn = f.rn + 1)
      |SELECT shard, COUNT(*) AS n_docs,
      |  CAST(MAX(bin) + 1 AS BIGINT) AS n_bins,
      |  CAST(SUM(t) AS BIGINT) AS sum_tokens,
      |  CAST(SUM(bin * t) AS BIGINT) AS sum_binw,
      |  CAST(SUM(off) AS BIGINT) AS sum_offset,
      |  COUNT(CASE WHEN t > 96 THEN 1 END) AS n_oversize
      |FROM fit GROUP BY shard""".stripMargin))

  /** q96: within-document repetition quality filters
    * ([[graft.text.QualityFilters]]) — top-bigram fraction, duplicated
    * trigram fraction, distinct-token ratio — rolled up per language
    * with a flag census at thresholds that split the corpus. */
  val q96 = GQuery(
    "q96_repetition_quality",
    (s, d) => {
      import graft.text.QualityFilters
      val st = QualityFilters.repetitionStats(documents(s, d), "doc_id", "text")
      documents(s, d).select(col("doc_id").as("doc"), col("lang"))
        .join(st, Seq("doc"))
        .groupBy(col("lang"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          lavg6(col("distinct_token_ratio")).as("avg_dtr"),
          lavg6(col("top_ngram_frac")).as("avg_top"),
          lavg6(col("dup_ngram_frac")).as("avg_dup"),
          count(when(col("top_ngram_frac") > 0.04 ||
            col("dup_ngram_frac") > 0.05 ||
            col("distinct_token_ratio") < 0.35, 1)).as("n_flagged"))
    },
    Some(s"""WITH t AS (
      |  SELECT doc_id, lang, $wsSql AS ws FROM documents),
      |tok AS (
      |  SELECT doc_id, lang, len(ws) AS n_tokens,
      |    CASE WHEN len(ws) > 0 THEN
      |      CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE)
      |    END AS dtr
      |  FROM t),
      |g2 AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
      |  FROM t, UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) u(i)),
      |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
      |top2 AS (
      |  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS topf
      |  FROM c2 GROUP BY doc_id),
      |g3 AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
      |  FROM t, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) u(i)),
      |c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
      |dup3 AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
      |      / CAST(SUM(c) AS DOUBLE) AS dupf
      |  FROM c3 GROUP BY doc_id),
      |j AS (
      |  SELECT tok.lang, tok.dtr, top2.topf, dup3.dupf
      |  FROM tok LEFT JOIN top2 USING (doc_id) LEFT JOIN dup3 USING (doc_id))
      |SELECT lang, COUNT(*) AS n_docs,
      |  ${sqlLavg6("dtr")} AS avg_dtr,
      |  ${sqlLavg6("topf")} AS avg_top,
      |  ${sqlLavg6("dupf")} AS avg_dup,
      |  COUNT(CASE WHEN topf > 0.04 OR dupf > 0.05 OR dtr < 0.35 THEN 1 END) AS n_flagged
      |FROM j GROUP BY lang""".stripMargin))

  /** q98: concat-and-chunk segment materialization
    * ([[graft.text.Packing.chunks]]) over the q91 layout — per shard:
    * segment/split-doc census, token conservation, and segment-length
    * extremes. The oracle rebuilds the contiguous-fill positions with
    * the same window cumsum and explodes each document's touched-bin
    * range. */
  val q98 = GQuery(
    "q98_sequence_chunks",
    (s, d) => {
      import graft.text.Packing
      val docs = documents(s, d)
        .withColumn("n_tok", bpeishCount(col("text")))
      val packed = Packing.pack(docs, "doc_id", "n_tok",
        capacity = 2048L, nShards = 8)
      val seg = Packing.chunks(packed, 2048L)
      val perDoc = seg.groupBy(col("shard"), col("doc_id"))
        .agg(count(lit(1)).as("nseg"), sum(col("tok_end") - col("tok_start")).as("tok"))
      perDoc.groupBy(col("shard"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          sum(col("nseg")).as("n_segments"),
          count(when(col("nseg") > 1, 1)).as("n_split_docs"),
          sum(col("tok")).as("sum_seg_tokens"))
    },
    Some(s"""WITH docs AS (
      |  SELECT doc_id, CAST($bpeSql AS BIGINT) AS t,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 8 AS shard
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, shard, t,
      |    SUM(t) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - t AS gs
      |  FROM docs),
      |seg AS (
      |  SELECT doc_id, shard,
      |    least((b + 1) * 2048, gs + t) - greatest(b * 2048, gs) AS seg_tok
      |  FROM packed,
      |    UNNEST(generate_series(CAST(gs // 2048 AS BIGINT),
      |      CAST((CASE WHEN t > 0 THEN gs + t - 1 ELSE gs END) // 2048 AS BIGINT))) AS u(b)),
      |per_doc AS (
      |  SELECT shard, doc_id, COUNT(*) AS nseg, SUM(seg_tok) AS tok
      |  FROM seg GROUP BY 1, 2)
      |SELECT shard, COUNT(*) AS n_docs,
      |  CAST(SUM(nseg) AS BIGINT) AS n_segments,
      |  COUNT(CASE WHEN nseg > 1 THEN 1 END) AS n_split_docs,
      |  CAST(SUM(tok) AS BIGINT) AS sum_seg_tokens
      |FROM per_doc GROUP BY shard""".stripMargin))

  /** q99: overlapping token-window chunking
    * ([[graft.text.Chunking.slidingWindows]], 64-token windows, 16
    * overlap) — per-language chunk census with a content checksum (sum
    * of 28-bit md5 hashes over every chunk text), so the oracle pins
    * the exact slicing, not just the counts. */
  val q99 = GQuery(
    "q99_sliding_chunks",
    (s, d) => {
      import graft.text.Chunking
      val ch = Chunking.slidingWindows(documents(s, d), "doc_id", "text",
        maxTokens = 64, overlap = 16)
      val perDoc = ch.groupBy(col("doc"))
        .agg(count(lit(1)).as("nw"),
          sum(col("tok_end") - col("tok_start")).as("tok"),
          sum(graft.dedup.Dedup.md5Hash28(col("chunk_text"))).as("hsum"))
      documents(s, d).select(col("doc_id").as("doc"), col("lang"))
        .join(perDoc, Seq("doc"))
        .groupBy(col("lang"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          sum(col("nw")).as("n_chunks"),
          count(when(col("nw") > 1, 1)).as("n_multi"),
          sum(col("tok")).as("sum_tokens"),
          sum(col("hsum")).as("hash_sum"))
    },
    Some(s"""WITH t AS (
      |  SELECT doc_id, lang, $wsSql AS ws, CAST(len($wsSql) AS BIGINT) AS n
      |  FROM documents),
      |win AS (
      |  SELECT doc_id, lang, n, w,
      |    least(w * 48 + 64, n) - w * 48 AS tok,
      |    array_to_string(ws[CAST(w * 48 + 1 AS BIGINT):least(w * 48 + 64, n)], ' ') AS chunk
      |  FROM t, UNNEST(generate_series(0,
      |    CAST(CASE WHEN n <= 64 THEN 0
      |         ELSE (n - 64 + 47) // 48 END AS BIGINT))) AS u(w)),
      |per_doc AS (
      |  SELECT doc_id, lang, COUNT(*) AS nw, SUM(tok) AS tok,
      |    SUM(CAST(('0x' || substr(md5(chunk), 1, 7)) AS BIGINT)) AS hsum
      |  FROM win GROUP BY 1, 2)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(nw) AS BIGINT) AS n_chunks,
      |  COUNT(CASE WHEN nw > 1 THEN 1 END) AS n_multi,
      |  CAST(SUM(tok) AS BIGINT) AS sum_tokens,
      |  CAST(SUM(hsum) AS BIGINT) AS hash_sum
      |FROM per_doc GROUP BY lang""".stripMargin))

  /** q101: corpus vocabulary coverage ([[graft.text.Vocab.topVocab]]) —
    * the tokenizer-training prep table: top-25 tokens by frequency
    * (ties broken by token — a total order) with rank and the exact
    * cumulative share of all token occurrences they cover. Counts are
    * integer-exact; `cum_share` is one deterministic IEEE division per
    * row, rounded to 6 places in both engines. */
  val q101 = GQuery(
    "q101_vocab_coverage",
    (s, d) =>
      graft.text.Vocab.topVocab(documents(s, d), "text", k = 25)
        .select(col("token"), col("cnt"), col("rank"),
          round(col("cum_share"), 6).as("cum_share")),
    Some(s"""WITH tok AS (SELECT unnest($wsSql) AS token FROM documents),
      |counts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
      |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM counts),
      |ranked AS (
      |  SELECT token, cnt,
      |    row_number() OVER (ORDER BY cnt DESC, token) AS rank,
      |    SUM(cnt) OVER (ORDER BY cnt DESC, token
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM counts)
      |SELECT token, CAST(cnt AS BIGINT) AS cnt, CAST(rank AS BIGINT) AS rank,
      |  round(CAST(cum AS DOUBLE) / (SELECT total FROM tot), 6) AS cum_share
      |FROM ranked WHERE rank <= 25""".stripMargin))

  /** q106: PII scrub report ([[graft.text.Pii.scrub]]) — per-document
    * email/IPv4/phone match counts and the md5 signature + length of
    * the redacted text. The synthetic corpus contains no PII, so both
    * engines first derive the same deterministic PII-bearing text from
    * document fields (one email, one phone, one IP injected per row);
    * the scrub then runs on data that actually exercises every
    * pattern, and the per-row signature proves byte-identical
    * redaction. Patterns live in the Java∩RE2 regex subset so Spark
    * and DuckDB match identically (see [[graft.text.Pii]]). */
  val q106 = GQuery(
    "q106_pii_scrub",
    (s, d) => {
      val injected = documents(s, d).select(col("doc_id"),
        concat(
          lit("contact "), col("lang"), lit("."), col("doc_id").cast("string"),
          lit("@"), col("source"), lit(".org call +670-"),
          (col("doc_id") % 900 + 100).cast("string"), lit("-"),
          (col("doc_id") % 9000 + 1000).cast("string"),
          lit(" ip 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), ((col("doc_id") * 7) % 256).cast("string"),
          lit(" "), col("text")).as("txt"))
      graft.text.Pii.scrub(injected, "txt")
        .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
          substring(md5(col("redacted")), 1, 8).as("sig"),
          length(col("redacted")).cast("long").as("n_red"))
    },
    Some("""WITH t AS (
      |  SELECT doc_id,
      |    'contact ' || lang || '.' || CAST(doc_id AS VARCHAR) || '@' || source ||
      |    '.org call +670-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||
      |    CAST(doc_id % 9000 + 1000 AS VARCHAR) ||
      |    ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
      |    CAST((doc_id * 7) % 256 AS VARCHAR) || ' ' || text AS txt
      |  FROM documents),
      |r AS (
      |  SELECT doc_id,
      |    len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      |    len(regexp_extract_all(txt, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
      |    len(regexp_extract_all(txt, '\+?\d{1,3}-\d{3}-\d{3,4}')) AS n_phones,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(txt,
      |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |      '\+?\d{1,3}-\d{3}-\d{3,4}', '<PHONE>', 'g') AS red
      |  FROM t)
      |SELECT doc_id, n_emails, n_ips, n_phones,
      |  substr(md5(red), 1, 8) AS sig, CAST(length(red) AS BIGINT) AS n_red
      |FROM r""".stripMargin))

  /** q107: cross-document boilerplate removal
    * ([[graft.text.Boilerplate.removeRepeatedNgrams]]) — token bigrams
    * occurring in more than 20% of a source's documents are masked out
    * of every document of that source, and the text is reassembled from
    * the surviving tokens. Per-doc report: original token count, masked
    * token count, and the md5 signature of the cleaned text (the
    * signature proves both engines mask the identical positions and
    * reassemble the identical bytes). The threshold is a scope
    * fraction, integer cross-multiplied — scale-invariant and exact. */
  val q107 = GQuery(
    "q107_boilerplate_removal",
    (s, d) =>
      graft.text.Boilerplate.removeRepeatedNgrams(
          documents(s, d), "doc_id", "source", "text", n = 2, maxDfPct = 20)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          substring(md5(col("cleaned")), 1, 8).as("sig")),
    Some(s"""WITH tok AS (
      |  SELECT doc_id, source, unnest($wsSql) AS token,
      |    generate_subscripts($wsSql, 1) - 1 AS pos
      |  FROM documents),
      |g AS (
      |  SELECT a.doc_id, a.source, a.pos AS start, a.token || ' ' || b.token AS gram
      |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
      |scope_n AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      |boil AS (
      |  SELECT dfc.source, dfc.gram FROM (
      |    SELECT source, gram, COUNT(DISTINCT doc_id) AS gdf FROM g GROUP BY 1, 2) dfc
      |  JOIN scope_n sn ON sn.source = dfc.source
      |  WHERE dfc.gdf * 100 > sn.n_docs * 20),
      |covered AS (
      |  SELECT DISTINCT g.doc_id, g.start + o.o AS pos
      |  FROM g JOIN boil ON g.source = boil.source AND g.gram = boil.gram
      |  CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS o) o),
      |kept AS (
      |  SELECT t.doc_id, t.pos, t.token FROM tok t
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM covered c WHERE c.doc_id = t.doc_id AND c.pos = t.pos)),
      |totals AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tok GROUP BY doc_id),
      |keptagg AS (
      |  SELECT doc_id, COUNT(*) AS n_kept,
      |    string_agg(token, ' ' ORDER BY pos) AS cleaned
      |  FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, t.n_tokens,
      |  t.n_tokens - COALESCE(k.n_kept, 0) AS n_removed,
      |  substr(md5(COALESCE(k.cleaned, '')), 1, 8) AS sig
      |FROM totals t LEFT JOIN keptagg k ON k.doc_id = t.doc_id""".stripMargin))

  /** q109: per-language frequent tokens via the Misra–Gries
    * heavy-hitters sketch ([[graft.functions.HeavyHitters]], a bounded
    * `TypedImperativeAggregate` with map-side partials): top-10 of the
    * capacity-64 summary. Capacity exceeds each language's distinct
    * token count on this corpus, so the sketch is provably exact
    * (no decrement ever fires) and the oracle is the exact frequency
    * table; the approximation regime is property-tested in
    * HeavyHittersSpec. */
  val q109 = GQuery(
    "q109_heavy_hitters",
    (s, d) => {
      graft.functions.HeavyHitters.register(s)
      documents(s, d)
        .select(col("lang"), explode(wsTokens(col("text"))).as("token"))
        .groupBy(col("lang"))
        .agg(call_function("heavy_hitters", col("token"), lit(64)).as("hh"))
        .select(col("lang"), posexplode(col("hh")).as(Seq("i", "s")))
        .filter(col("i") < 10)
        .select(col("lang"), (col("i") + 1).cast("long").as("rank"),
          col("s.item").as("token"), col("s.cnt").as("cnt"))
    },
    Some(s"""WITH tok AS (SELECT lang, unnest($wsSql) AS token FROM documents),
      |c AS (SELECT lang, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
      |r AS (
      |  SELECT lang, token, cnt,
      |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rank
      |  FROM c)
      |SELECT lang, CAST(rank AS BIGINT) AS rank, token, CAST(cnt AS BIGINT) AS cnt
      |FROM r WHERE rank <= 10""".stripMargin))

  /** q110: Unicode NFC normalization
    * ([[graft.functions.NfcNormalize]], native codegen expression) —
    * the canonical-composition pass that makes equality-based operators
    * (dedup hashes, shingles, vocab counts) see one spelling per text.
    * The ASCII corpus is already NFC, so both engines prepend the same
    * decomposed sequences (combining acute/diaeresis) to every row;
    * the char counts drop by exactly the composed marks and the md5
    * signature proves byte-identical composition. */
  val q110 = GQuery(
    "q110_unicode_nfc",
    (s, d) => {
      graft.functions.NfcNormalize.register(s)
      documents(s, d)
        .select(col("doc_id"),
          concat(lit("Cafe\u0301 nai\u0308ve "), col("text")).as("txt"))
        .select(col("doc_id"),
          length(col("txt")).cast("long").as("n_raw"),
          length(call_function("unicode_nfc", col("txt"))).cast("long").as("n_nfc"),
          substring(md5(call_function("unicode_nfc", col("txt"))), 1, 8).as("sig"))
    },
    Some("""WITH t AS (
      |  SELECT doc_id,
      |    'Cafe' || chr(769) || ' nai' || chr(776) || 've ' || text AS txt
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(txt) AS BIGINT) AS n_raw,
      |  CAST(length(nfc_normalize(txt)) AS BIGINT) AS n_nfc,
      |  substr(md5(nfc_normalize(txt)), 1, 8) AS sig
      |FROM t""".stripMargin))

  /** q111: the composed curation pipeline ([[graft.text.Curation]]) —
    * NFC normalize → PII redact → exact-dedup on the redacted
    * fingerprint (keep-min-id) → token-count quality gate, over two
    * overlapping "crawls". The re-crawl carries different injected PII
    * (ids differ), so the crawls only become exact duplicates AFTER
    * redaction — the census proves the stage ordering end-to-end, and
    * the integer hash-prefix checksum pins the surviving corpus's exact
    * bytes. Full-oracle, like the fisheries DAG's q95: every stage has
    * an engine-portable SQL mirror. */
  val q111 = GQuery(
    "q111_curation_pipeline",
    (s, d) => {
      val docs = documents(s, d)
      val crawl2 = docs.filter(col("doc_id") < 250)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          lit("crawl2").as("source"), col("text"), col("n_chars"))
      val injected = docs.unionByName(crawl2).select(col("doc_id"), col("lang"),
        concat(
          lit("Cafe\u0301 contact "), col("lang"), col("doc_id").cast("string"),
          lit("@"), col("source"), lit(".org call +670-"),
          (col("doc_id") % 900 + 100).cast("string"), lit("-"),
          (col("doc_id") % 9000 + 1000).cast("string"),
          lit(" ip 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), ((col("doc_id") * 7) % 256).cast("string"),
          lit(" "), col("text")).as("txt"))
      graft.text.Curation.curate(injected, "doc_id", "txt", minTokens = 45)
        .groupBy(col("lang"))
        .agg(
          lcount(lit(1)).as("n_rows"),
          count(when(col("is_canonical"), 1)).as("n_canonical"),
          count(when(col("kept"), 1)).as("n_kept"),
          sum(when(col("kept"), col("n_tokens"))).as("kept_tokens"),
          sum(when(col("kept"),
            conv(substring(md5(col("redacted")), 1, 7), 16, 10).cast("long")))
            .as("checksum"))
    },
    Some("""WITH corpus AS (
      |  SELECT doc_id, lang, source, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, lang, 'crawl2' AS source, text
      |  FROM documents WHERE doc_id < 250),
      |t AS (
      |  SELECT doc_id, lang,
      |    nfc_normalize('Cafe' || chr(769) || ' contact ' || lang ||
      |      CAST(doc_id AS VARCHAR) || '@' || source || '.org call +670-' ||
      |      CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||
      |      CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' ip 10.0.' ||
      |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
      |      CAST((doc_id * 7) % 256 AS VARCHAR) || ' ' || text) AS norm
      |  FROM corpus),
      |r AS (
      |  SELECT doc_id, lang,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(norm,
      |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |      '\+?\d{1,3}-\d{3}-\d{3,4}', '<PHONE>', 'g') AS red
      |  FROM t),
      |f AS (
      |  SELECT doc_id, lang, red, md5(red) AS fp,
      |    CAST(len(string_split_regex(trim(red), '\s+')) AS BIGINT) AS n_tokens
      |  FROM r),
      |k AS (SELECT fp, MIN(doc_id) AS keep_id FROM f GROUP BY fp),
      |m AS (SELECT f.*, (f.doc_id = k.keep_id) AS canon FROM f JOIN k USING (fp))
      |SELECT lang, COUNT(*) AS n_rows,
      |  COUNT(CASE WHEN canon THEN 1 END) AS n_canonical,
      |  COUNT(CASE WHEN canon AND n_tokens >= 45 THEN 1 END) AS n_kept,
      |  CAST(SUM(CASE WHEN canon AND n_tokens >= 45 THEN n_tokens END) AS BIGINT) AS kept_tokens,
      |  CAST(SUM(CASE WHEN canon AND n_tokens >= 45
      |    THEN CAST(('0x' || substr(md5(red), 1, 7)) AS BIGINT) END) AS BIGINT) AS checksum
      |FROM m GROUP BY lang""".stripMargin))

  /** q112: BM25 ranked retrieval ([[graft.text.Bm25]]) — the query
    * workload is itself derived from the corpus (per-lang top-3 terms
    * by in-lang document frequency, ties by term) so the whole thing is
    * deterministic and engine-portable. Scores are e9-scaled integer
    * sums of per-term weights whose only float steps are one ln / one
    * divide / one multiply over int64 counts — ranking is integer,
    * never a float-summation-order artifact. */
  /** Shared SQL mirror of the q112 BM25 pipeline through the scored
    * (lang, doc_id, bm25_e9) frame — also the lexical arm of the q136
    * fusion oracle. */
  private val bm25CtesSql =
    """toks AS (
      |  SELECT doc_id, lang, t.term
      |  FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
      |  WHERE length(t.term) >= 3),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |tot AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
      |               (SELECT SUM(dl) FROM dl) AS l),
      |ldf AS (
      |  SELECT lang, term, COUNT(*) AS ldf
      |  FROM (SELECT DISTINCT doc_id, lang, term FROM toks) GROUP BY 1, 2),
      |qt AS (
      |  SELECT lang, term FROM (
      |    SELECT lang, term,
      |      row_number() OVER (PARTITION BY lang ORDER BY ldf DESC, term ASC) AS r
      |    FROM ldf) WHERE r <= 3),
      |contrib AS (
      |  SELECT qt.lang, tf.doc_id,
      |    ln(CAST(2 * tot.n + 2 AS DOUBLE) / CAST(2 * df.df + 1 AS DOUBLE)) *
      |    (CAST(44 * tot.l * tf.tf AS DOUBLE) /
      |     CAST(20 * tot.l * tf.tf + 6 * tot.l + 18 * dl.dl * tot.n AS DOUBLE)) AS c
      |  FROM qt JOIN tf USING (term) JOIN df USING (term)
      |    JOIN dl USING (doc_id) CROSS JOIN tot),
      |sc AS (
      |  SELECT lang, doc_id,
      |    CAST(SUM(CAST(floor(c * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS bm25_e9
      |  FROM contrib GROUP BY 1, 2)""".stripMargin

  val q112 = GQuery(
    "q112_bm25_retrieval",
    (s, d) => {
      import graft.text.Bm25
      val docs = documents(s, d)
      val toks = docs.select(col("doc_id"), col("lang"),
        explode(Bm25.tokens(col("text"))).as("term"))
      val ldf = toks.select(col("doc_id"), col("lang"), col("term")).distinct()
        .groupBy(col("lang"), col("term")).agg(lcount(lit(1)).as("ldf"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("ldf").desc, col("term").asc)
      val qt = ldf.withColumn("r", row_number().over(w)).filter(col("r") <= 3)
        .select(col("lang"), col("term"))
      Bm25.retrieve(docs, "doc_id", "text", qt, "lang", "term", k = 5)
    },
    Some(s"""WITH $bm25CtesSql
      |SELECT lang, CAST(r AS BIGINT) AS rank, doc_id, bm25_e9
      |FROM (SELECT lang, doc_id, bm25_e9,
      |        row_number() OVER (PARTITION BY lang
      |                           ORDER BY bm25_e9 DESC, doc_id ASC) AS r
      |      FROM sc)
      |WHERE r <= 5""".stripMargin))

  /** q193: ranked-retrieval evaluation ([[graft.text.RetrievalEval]])
    * — the metrics layer the retrieval stack (q112 BM25, q136 fusion,
    * ANN rerank) is judged by: per query, recall@10, reciprocal rank
    * of the first relevant hit, and nDCG@10 with graded relevance
    * (gain 2^rel − 1, log2 discount). Runs are the q112 BM25 pipeline
    * at k = 10; qrels grade every in-lang document 1 or 2 by doc-id
    * parity, so all three metrics exercise non-trivially (BM25
    * retrieves cross-lang documents its query terms also hit). The
    * oracle replays runs, ideal ranking, and every metric division;
    * RetrievalEvalSpec pins the hand-checked edges (no-qrels query →
    * NULL, no-hit query → 0, perfect ranking → 1). */
  val q193 = GQuery(
    "q193_retrieval_eval",
    (s, d) => {
      import graft.text.{Bm25, RetrievalEval}
      val docs = documents(s, d)
      val toks = docs.select(col("doc_id"), col("lang"),
        explode(Bm25.tokens(col("text"))).as("term"))
      val ldf = toks.select(col("doc_id"), col("lang"), col("term")).distinct()
        .groupBy(col("lang"), col("term")).agg(lcount(lit(1)).as("ldf"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("ldf").desc, col("term").asc)
      val qt = ldf.withColumn("r", row_number().over(w)).filter(col("r") <= 3)
        .select(col("lang"), col("term"))
      val runs = Bm25.retrieve(docs, "doc_id", "text", qt, "lang", "term", k = 10)
      val qrels = docs.select(col("lang"), col("doc_id"),
        (lit(1L) + col("doc_id") % 2).as("rel"))
      RetrievalEval.metrics(runs, qrels, "lang", "doc_id", "rank", "rel", k = 10)
    },
    Some(s"""WITH $bm25CtesSql,
      |runs AS (
      |  SELECT lang, doc_id, r AS rank FROM (
      |    SELECT lang, doc_id,
      |      row_number() OVER (PARTITION BY lang
      |                         ORDER BY bm25_e9 DESC, doc_id ASC) AS r
      |    FROM sc) WHERE r <= 10),
      |qrels AS (SELECT lang, doc_id, 1 + doc_id % 2 AS rel FROM documents),
      |ideal AS (
      |  SELECT lang, COUNT(*) AS n_rel,
      |    SUM(CASE WHEN ir <= 10
      |        THEN (pow(2.0, rel) - 1.0) / (ln(ir + 1.0) / ln(2.0))
      |        ELSE 0.0 END) AS idcg
      |  FROM (SELECT lang, rel, doc_id,
      |          row_number() OVER (PARTITION BY lang
      |                             ORDER BY rel DESC, doc_id ASC) AS ir
      |        FROM qrels) GROUP BY lang),
      |hits AS (
      |  SELECT r.lang, COUNT(*) AS n_hits, MIN(r.rank) AS r1,
      |    SUM((pow(2.0, q.rel) - 1.0) / (ln(r.rank + 1.0) / ln(2.0))) AS dcg
      |  FROM runs r JOIN qrels q ON r.lang = q.lang AND r.doc_id = q.doc_id
      |  GROUP BY r.lang)
      |SELECT ql.lang, CAST(COALESCE(i.n_rel, 0) AS BIGINT) AS n_rel,
      |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
      |  round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / i.n_rel, 6) AS recall,
      |  round(COALESCE(1.0 / h.r1, 0.0), 6) AS rr,
      |  round(COALESCE(h.dcg, 0.0) / i.idcg, 6) AS ndcg
      |FROM (SELECT DISTINCT lang FROM runs) ql
      |LEFT JOIN ideal i ON ql.lang = i.lang
      |LEFT JOIN hits h ON ql.lang = h.lang""".stripMargin))

  /** q195: template-normalized dedup census
    * ([[graft.text.TextFunctions.templateFingerprint]]) — the masked
    * exact-dedup pass instruction-data curation runs beside q36's raw
    * pass: URLs and digit runs masked before fingerprinting, so
    * mail-merge documents (same template, different ids/counts/links)
    * collapse to one key that byte-exact dedup misses. Per source:
    * raw-duplicate mass, template-duplicate mass, and the
    * TEMPLATE-ONLY surplus (the rows only the masked pass catches) —
    * the number a curation run uses to decide whether the masked pass
    * pays for itself on a source. */
  val q195 = GQuery(
    "q195_template_dedup",
    (s, d) => {
      import graft.text.TextFunctions
      documents(s, d)
        .select(col("source"),
          TextFunctions.fingerprint(col("text")).as("__raw"),
          TextFunctions.templateFingerprint(col("text")).as("__tpl"))
        .groupBy(col("source"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          (lcount(lit(1)) - countDistinct(col("__raw"))).as("n_raw_dup"),
          (lcount(lit(1)) - countDistinct(col("__tpl"))).as("n_template_dup"),
          (countDistinct(col("__raw")) - countDistinct(col("__tpl")))
            .as("n_template_only"))
    },
    Some("""WITH fp AS (
      |  SELECT source,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS raw,
      |    md5(trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
      |      'https?://[^ \t\n]+', '<url>', 'g'),
      |      '[0-9]+', '<num>', 'g'),
      |      '\s+', ' ', 'g'))) AS tpl
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  COUNT(*) - COUNT(DISTINCT raw) AS n_raw_dup,
      |  COUNT(*) - COUNT(DISTINCT tpl) AS n_template_dup,
      |  CAST(COUNT(DISTINCT raw) - COUNT(DISTINCT tpl) AS BIGINT) AS n_template_only
      |FROM fp GROUP BY source""".stripMargin))

  /** q115: corpus report (dataset card) — per-source census of size,
    * token mass, language mix, exact-dup mass, median length, and
    * PII-bearing rows. Pure single-pass groupBy composition of the
    * suite's primitives; every figure integer or type-7-exact. */
  val q115 = GQuery(
    "q115_corpus_report",
    (s, d) => {
      import graft.text.{Pii, TextFunctions}
      documents(s, d)
        .select(col("source"), col("lang"), col("doc_id"), col("n_chars"),
          size(TextFunctions.wsTokens(col("text"))).cast("long").as("__t"),
          md5(col("text")).as("__fp"),
          regexp_like(col("text"), lit(Pii.EmailRe)).as("__pii"))
        .groupBy(col("source"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          sum(col("__t")).as("n_tokens"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("lang")).as("n_langs"),
          (lcount(lit(1)) - countDistinct(col("__fp"))).as("n_dupes"),
          round(expr("percentile(n_chars, 0.5)"), 6).as("p50_chars"),
          count(when(col("__pii"), 1)).as("pii_docs"))
    },
    Some(s"""SELECT source,
      |COUNT(*) AS n_docs,
      |CAST(SUM(len($wsSql)) AS BIGINT) AS n_tokens,
      |CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dupes,
      |round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
      |COUNT(CASE WHEN regexp_matches(text,
      |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') THEN 1 END) AS pii_docs
      |FROM documents GROUP BY source""".stripMargin))

  /** q116: token-budget selection ([[graft.text.Budget]]) — per-lang
    * 50k-token budgets, score = token count (any totally-ordered score
    * plugs in), tiebreak doc_id. The id-sum checksum pins the exact
    * selected set, not just its size. */
  val q116 = GQuery(
    "q116_token_budget",
    (s, d) => {
      import graft.text.{Budget, TextFunctions}
      val t = documents(s, d).select(col("doc_id"), col("lang"),
        size(TextFunctions.wsTokens(col("text"))).cast("long").as("n_tokens"))
      Budget.selectUnderBudget(t, Seq("lang"),
          scoreCol = col("n_tokens"), tokensCol = col("n_tokens"),
          tiebreak = col("doc_id"), budget = 50000L)
        .groupBy(col("lang"))
        .agg(
          lcount(lit(1)).as("n_selected"),
          sum(col("n_tokens")).as("tokens_selected"),
          sum(col("doc_id")).as("id_checksum"))
    },
    Some(s"""WITH t AS (
      |  SELECT doc_id, lang, CAST(len($wsSql) AS BIGINT) AS n_tokens
      |  FROM documents),
      |r AS (
      |  SELECT *, SUM(n_tokens) OVER (
      |    PARTITION BY lang ORDER BY n_tokens DESC, doc_id ASC
      |    ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t)
      |SELECT lang, COUNT(*) AS n_selected,
      |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      |FROM r WHERE cum <= 50000 GROUP BY lang""".stripMargin))

  /** q120: stride-scheduled training order ([[graft.text.Schedule]])
    * — per-lang weights = doc counts (self-proportional mixture), so a
    * t-fraction prefix of virtual time holds ≈ t of every source. The
    * census counts each lang's documents inside the 25 % / 50 % / 100 %
    * prefixes and pins the exact 25 % membership with an id-sum. */
  val q120 = GQuery(
    "q120_stride_schedule",
    (s, d) => {
      import graft.text.Schedule
      val docs = documents(s, d)
      val wts = docs.groupBy(col("lang")).agg(lcount(lit(1)).as("w"))
      val keyed = Schedule.withScheduleKey(
        docs.select(col("doc_id"), col("lang")).join(wts, "lang"),
        "doc_id", "lang", "w")
      val t1 = Schedule.Scale / 4
      val t2 = Schedule.Scale / 2
      keyed.groupBy(col("lang"))
        .agg(
          count(when(col("schedule_key") <= t1, 1)).as("n_q1"),
          count(when(col("schedule_key") <= t2, 1)).as("n_q2"),
          count(when(col("schedule_key") <= Schedule.Scale, 1)).as("n_all"),
          sum(when(col("schedule_key") <= t1, col("doc_id"))).as("q1_checksum"))
    },
    Some(s"""WITH wts AS (SELECT lang, COUNT(*) AS w FROM documents GROUP BY lang),
      |r AS (
      |  SELECT d.doc_id, d.lang, w.w,
      |    row_number() OVER (PARTITION BY d.lang
      |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)) ASC, d.doc_id ASC) AS r
      |  FROM documents d JOIN wts w USING (lang)),
      |k AS (
      |  SELECT doc_id, lang,
      |    ((2 * r - 1) * 1000000000) // (2 * w) AS key
      |  FROM r)
      |SELECT lang,
      |  COUNT(CASE WHEN key <= 250000000 THEN 1 END) AS n_q1,
      |  COUNT(CASE WHEN key <= 500000000 THEN 1 END) AS n_q2,
      |  COUNT(CASE WHEN key <= 1000000000 THEN 1 END) AS n_all,
      |  CAST(SUM(CASE WHEN key <= 250000000 THEN doc_id END) AS BIGINT) AS q1_checksum
      |FROM k GROUP BY lang""".stripMargin))

  /** q121: length-bucketed batch planning
    * ([[graft.text.Packing.lengthBatches]]) — per-shard padding bill
    * under length-sorted vs md5-arrival batching (batch 32, 8 shards).
    * The saving the sorted order buys is the measured figure, not a
    * claim. All integers. */
  val q121 = GQuery(
    "q121_length_batching",
    (s, d) => {
      import graft.text.Packing
      val toks = documents(s, d).select(col("doc_id"),
        size(graft.text.TextFunctions.wsTokens(col("text"))).as("n_toks"))
      Packing.paddingCensus(Packing.lengthBatches(
        toks, "doc_id", "n_toks", batchSize = 32, nShards = 8))
    },
    Some(s"""WITH t AS (
      |  SELECT doc_id, CAST(len($wsSql) AS BIGINT) AS n_tokens FROM documents),
      |sh AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 8 AS shard
      |  FROM t),
      |r AS (
      |  SELECT shard, doc_id, n_tokens,
      |    row_number() OVER (PARTITION BY shard ORDER BY n_tokens ASC, doc_id ASC) AS rs,
      |    row_number() OVER (PARTITION BY shard
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS ra
      |  FROM sh),
      |b AS (SELECT shard, doc_id, n_tokens,
      |        (rs - 1) // 32 AS sb, (ra - 1) // 32 AS ab FROM r),
      |sp AS (
      |  SELECT shard, sb, COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS pad,
      |    SUM(n_tokens) AS tok
      |  FROM b GROUP BY 1, 2),
      |ap AS (
      |  SELECT shard, ab, COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS pad
      |  FROM b GROUP BY 1, 2)
      |SELECT sp2.shard, sp2.n_batches, sp2.sorted_padding, sp2.n_tokens,
      |  ap2.arrival_padding
      |FROM (SELECT shard, COUNT(*) AS n_batches,
      |        CAST(SUM(pad) AS BIGINT) AS sorted_padding,
      |        CAST(SUM(tok) AS BIGINT) AS n_tokens
      |      FROM sp GROUP BY shard) sp2
      |JOIN (SELECT shard, CAST(SUM(pad) AS BIGINT) AS arrival_padding
      |      FROM ap GROUP BY shard) ap2 USING (shard)""".stripMargin))

  /** q126: importance-weighted domain selection (the
    * perplexity-difference flavour of DSIR): held-out docs scored by
    * `logprob(target LM) − logprob(base LM)` — positive means "looks
    * like the target domain" — top-20 selected via a bounded heap
    * (TakeOrdered, never a global sort). Target LM trains on the 'de'
    * half-split, base LM on the non-'de' half-split, both through
    * [[graft.text.LangModel]]; weights are e6-floored (q89's parity
    * bound for ln). */
  val q126 = GQuery(
    "q126_importance_selection",
    (s, d) => {
      import graft.text.LangModel
      val docs = documents(s, d)
      val mT = LangModel.train(
        docs.filter(col("lang") === "de" && col("doc_id") % 2 === 0), "doc_id", "text")
      val mB = LangModel.train(
        docs.filter(col("lang") =!= "de" && col("doc_id") % 2 === 0), "doc_id", "text")
      val cand = docs.filter(col("doc_id") % 2 === 1)
      val sT = LangModel.score(cand, mT, "doc_id", "text")
        .select(col("doc"), col("n_bigrams"), col("logprob").as("__lpT"))
      val sB = LangModel.score(cand, mB, "doc_id", "text")
        .select(col("doc"), col("logprob").as("__lpB"))
      sT.join(sB, "doc")
        .withColumn("w_e6",
          floor((col("__lpT") - col("__lpB")) * 1e6 + 0.5).cast("long"))
        .select(col("doc"), col("n_bigrams"), col("w_e6"))
        .orderBy(col("w_e6").desc, col("doc").asc)
        .limit(20)
    },
    Some(s"""WITH bg AS (
      |  SELECT doc_id AS doc, lang, ws[i] AS w1, ws[i+1] AS w2
      |  FROM (SELECT doc_id, lang, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)),
      |tk AS (SELECT doc_id AS doc, lang, unnest($wsSql) AS w FROM documents),
      |cbgT AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg
      |         WHERE lang = 'de' AND doc % 2 = 0 GROUP BY 1, 2),
      |cuniT AS (SELECT w AS w1, COUNT(*) AS c1 FROM tk
      |          WHERE lang = 'de' AND doc % 2 = 0 GROUP BY 1),
      |vocT AS (SELECT COUNT(DISTINCT w) AS v FROM tk
      |         WHERE lang = 'de' AND doc % 2 = 0),
      |scT AS (
      |  SELECT b.doc, COUNT(*) AS n_bigrams,
      |    ${graft.core.Exact.sqlLsumAt(
             "ln(CAST(COALESCE(g.c2, 0) + 1 AS DOUBLE) / " +
               "CAST(COALESCE(u.c1, 0) + vocT.v AS DOUBLE))", "1e9")} / COUNT(*) AS lp
      |  FROM bg b
      |  LEFT JOIN cbgT g ON b.w1 = g.w1 AND b.w2 = g.w2
      |  LEFT JOIN cuniT u ON b.w1 = u.w1
      |  CROSS JOIN vocT
      |  WHERE b.doc % 2 = 1 GROUP BY b.doc),
      |cbgB AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg
      |         WHERE lang <> 'de' AND doc % 2 = 0 GROUP BY 1, 2),
      |cuniB AS (SELECT w AS w1, COUNT(*) AS c1 FROM tk
      |          WHERE lang <> 'de' AND doc % 2 = 0 GROUP BY 1),
      |vocB AS (SELECT COUNT(DISTINCT w) AS v FROM tk
      |         WHERE lang <> 'de' AND doc % 2 = 0),
      |scB AS (
      |  SELECT b.doc, COUNT(*) AS n_bigrams,
      |    ${graft.core.Exact.sqlLsumAt(
             "ln(CAST(COALESCE(g.c2, 0) + 1 AS DOUBLE) / " +
               "CAST(COALESCE(u.c1, 0) + vocB.v AS DOUBLE))", "1e9")} / COUNT(*) AS lp
      |  FROM bg b
      |  LEFT JOIN cbgB g ON b.w1 = g.w1 AND b.w2 = g.w2
      |  LEFT JOIN cuniB u ON b.w1 = u.w1
      |  CROSS JOIN vocB
      |  WHERE b.doc % 2 = 1 GROUP BY b.doc)
      |SELECT t.doc, t.n_bigrams,
      |  CAST(floor((t.lp - b2.lp) * 1e6 + 0.5) AS BIGINT) AS w_e6
      |FROM scT t JOIN scB b2 USING (doc)
      |ORDER BY w_e6 DESC, doc ASC LIMIT 20""".stripMargin))

  /** q130: BPE trainer seed statistics ([[graft.text.Bpe.pairCensus]]
    * over [[graft.text.Vocab.tokenCounts]]) — the adjacent-character-
    * pair frequencies the first merge elects from, top 20 by (freq
    * desc, pair). This is the DISTRIBUTED half of tokenizer training
    * (the merge loop itself runs over the bounded vocabulary —
    * BpeSpec); the census is exactly iteration 0's candidate table, so
    * the oracle pins the statistics the whole loop derives from. The
    * rank window runs after the top-20 cap (k-bounded single
    * partition, same shape as q101). */
  val q130 = GQuery(
    "q130_bpe_pair_census",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("freq").desc, col("pair"))
      graft.text.Bpe.pairCensus(
          graft.text.Vocab.tokenCounts(documents(s, d), "text"))
        .orderBy(col("freq").desc, col("pair"))
        .limit(20)
        .withColumn("rank", row_number().over(w).cast("long"))
    },
    Some(s"""WITH tok AS (SELECT unnest($wsSql) AS token FROM documents),
      |counts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
      |pairs AS (
      |  SELECT substr(token, i, 1) || ' ' || substr(token, i + 1, 1) AS pair,
      |    CAST(SUM(cnt) AS BIGINT) AS freq
      |  FROM counts, UNNEST(generate_series(1, len(token) - 1)) AS u(i)
      |  GROUP BY 1),
      |ranked AS (
      |  SELECT pair, freq,
      |    CAST(row_number() OVER (ORDER BY freq DESC, pair) AS BIGINT) AS rank
      |  FROM pairs)
      |SELECT pair, freq, rank FROM ranked WHERE rank <= 20""".stripMargin))

  /** q132: Heaps-law vocabulary growth
    * ([[graft.text.Vocab.growthCurve]]) — cumulative token occurrences,
    * distinct vocabulary, and type-token ratio at id-ordered corpus
    * checkpoints. Zero joins on the big side: each token folds into
    * its first-occurrence checkpoint bucket; the cumulative window
    * runs over the bounded checkpoint spine. */
  private val growthCks: Seq[Long] =
    Seq(50L, 100L, 200L, 400L, 800L, 1600L, 3200L, 6400L, 12800L)

  val q132 = GQuery(
    "q132_vocab_growth",
    (s, d) =>
      graft.text.Vocab.growthCurve(documents(s, d), "doc_id", "text", growthCks)
        .select(col("checkpoint"), col("n_tokens"), col("vocab"),
          round(col("type_token_ratio"), 6).as("type_token_ratio")),
    Some {
      def ckCase(x: String) =
        "CASE " + growthCks.map(c => s"WHEN $x <= $c THEN $c").mkString(" ") + " END"
      s"""WITH tok AS (SELECT doc_id, unnest($wsSql) AS token FROM documents),
      |first AS (SELECT token, MIN(doc_id) AS fid FROM tok GROUP BY token),
      |newt AS (
      |  SELECT ${ckCase("fid")} AS checkpoint, COUNT(*) AS nt
      |  FROM first WHERE ${ckCase("fid")} IS NOT NULL GROUP BY 1),
      |occ AS (
      |  SELECT ${ckCase("doc_id")} AS checkpoint,
      |    SUM(len($wsSql)) AS no
      |  FROM documents WHERE ${ckCase("doc_id")} IS NOT NULL GROUP BY 1),
      |spine AS (SELECT unnest([${growthCks.mkString(", ")}]) AS checkpoint),
      |cum AS (
      |  SELECT s.checkpoint,
      |    CAST(SUM(COALESCE(o.no, 0)) OVER (ORDER BY s.checkpoint
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_tokens,
      |    CAST(SUM(COALESCE(n.nt, 0)) OVER (ORDER BY s.checkpoint
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab
      |  FROM spine s
      |  LEFT JOIN newt n ON s.checkpoint = n.checkpoint
      |  LEFT JOIN occ o ON s.checkpoint = o.checkpoint)
      |SELECT checkpoint, n_tokens, vocab,
      |  round(CASE WHEN n_tokens > 0
      |    THEN CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) END, 6)
      |    AS type_token_ratio
      |FROM cum""".stripMargin
    })

  /** q134: hashed-feature extraction census
    * ([[graft.stats.HashedLogReg.hashedFeatures]], dim 64) — per hash
    * bucket, the distinct-document and total-occurrence counts. This
    * is the quality classifier's feature stage (the distributed,
    * oracle-checkable half; gradient descent itself is spec-gated in
    * HashedLogRegSpec with determinism asserted via decimal-routed
    * sums). The hash is the vocabulary — no join, map-side-combinable
    * counts only. */
  val q134 = GQuery(
    "q134_feature_hashing",
    (s, d) =>
      graft.stats.HashedLogReg.hashedFeatures(documents(s, d), "doc_id", "text",
          dim = 64, salt = "fh")
        .groupBy(col("idx"))
        .agg(graft.core.Exact.lcount(lit(1)).as("n_docs"),
          sum(col("cnt")).as("n_occ")),
    Some(s"""WITH tok AS (SELECT doc_id, unnest($wsSql) AS token FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5('fh-' || token), 1, 7)) AS BIGINT) % 64 AS idx
      |  FROM tok)
      |SELECT idx, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_occ
      |FROM h GROUP BY idx""".stripMargin))

  /** q135: classifier-gated curation — a trained quality model (here a
    * literal 16-dim weight vector; in production the
    * [[graft.stats.HashedLogReg.train]] artifact) applied at corpus
    * scale: per-doc margin z = Σ cnt·w[idx] + b over hashed features,
    * keep z ≥ 0, per-language census. The gate thresholds the
    * PRE-sigmoid margin — σ is monotone, so keep/drop is identical,
    * and z is exact: weights are binary eighths (exact doubles, exact
    * DECIMAL), counts are integers, sums are decimal-routed — no exp()
    * anywhere near a decision boundary or a hash-compared value. */
  private val clfW: Seq[Double] = (0 until 16).map(i => ((i * 37) % 16 - 8) / 8.0)
  private val clfB = 0.25

  val q135 = GQuery(
    "q135_classifier_gate",
    (s, d) => {
      val docs = documents(s, d)
      val wArr = array(clfW.map(lit): _*)
      val z = graft.stats.HashedLogReg.hashedFeatures(docs, "doc_id", "text",
          dim = 16, salt = "fh")
        .withColumn("__t", element_at(wArr, col("idx").cast("int") + 1) * col("cnt"))
        .groupBy(col("__doc").as("doc_id"))
        .agg(graft.core.Exact.dsum(col("__t")).as("__z0"))
      docs.join(z, Seq("doc_id"), "left")
        .withColumn("__z", coalesce(col("__z0"), lit(0.0)) + lit(clfB))
        .groupBy(col("lang"))
        .agg(
          graft.core.Exact.lcount(lit(1)).as("n_docs"),
          sum(when(col("__z") >= 0, 1L).otherwise(0L)).as("n_kept"),
          round(graft.core.Exact.dsum(col("__z")), 6).as("sum_margin"))
    },
    Some {
      val wCase = "CASE idx " + clfW.zipWithIndex.map { case (w, i) =>
        s"WHEN $i THEN $w"
      }.mkString(" ") + " END"
      s"""WITH tok AS (SELECT doc_id, unnest($wsSql) AS token FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5('fh-' || token), 1, 7)) AS BIGINT) % 16 AS idx
      |  FROM tok),
      |f AS (SELECT doc_id, idx, COUNT(*) AS cnt FROM h GROUP BY 1, 2),
      |z AS (
      |  SELECT doc_id,
      |    CAST(SUM(CAST(cnt * ($wCase) AS DECIMAL(38,6))) AS DOUBLE) AS z0
      |  FROM f GROUP BY doc_id),
      |scored AS (
      |  SELECT d.lang, COALESCE(z.z0, 0.0) + $clfB AS zz
      |  FROM documents d LEFT JOIN z ON d.doc_id = z.doc_id)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN zz >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  round(CAST(SUM(CAST(zz AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_margin
      |FROM scored GROUP BY lang""".stripMargin
    })

  /** q200: probability-calibration census
    * ([[graft.stats.Calibration]]) — the reliability audit a
    * score-gated pipeline runs before trusting its thresholds: the
    * q135 classifier margins pass through the sigmoid, bucket into 10
    * fixed-width reliability bins against a deterministic ground
    * truth, and each bin reports predicted confidence vs empirical
    * rate plus its ECE contribution (Σ over bins = the headline
    * Expected Calibration Error). Bucket edges are pure IEEE floor
    * arithmetic and the means ride decimal-routed sums, so every bin
    * boundary and figure replays in the oracle. */
  val q200 = GQuery(
    "q200_calibration_census",
    (s, d) => {
      val docs = documents(s, d)
      val wArr = array(clfW.map(lit): _*)
      val z = graft.stats.HashedLogReg.hashedFeatures(docs, "doc_id", "text",
          dim = 16, salt = "fh")
        .withColumn("__t", element_at(wArr, col("idx").cast("int") + 1) * col("cnt"))
        .groupBy(col("__doc").as("doc_id"))
        .agg(graft.core.Exact.dsum(col("__t")).as("__z0"))
      val scored = docs.join(z, Seq("doc_id"), "left")
        .withColumn("__z", coalesce(col("__z0"), lit(0.0)) + lit(clfB))
        .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("__z"))))
        .withColumn("label", (col("n_chars") > 2000).cast("int"))
      graft.stats.Calibration.census(scored, "score", "label", nBuckets = 10)
    },
    Some {
      val wCase = "CASE idx " + clfW.zipWithIndex.map { case (w, i) =>
        s"WHEN $i THEN $w"
      }.mkString(" ") + " END"
      s"""WITH tok AS (SELECT doc_id, unnest($wsSql) AS token FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5('fh-' || token), 1, 7)) AS BIGINT) % 16 AS idx
      |  FROM tok),
      |f AS (SELECT doc_id, idx, COUNT(*) AS cnt FROM h GROUP BY 1, 2),
      |z AS (
      |  SELECT doc_id,
      |    CAST(SUM(CAST(cnt * ($wCase) AS DECIMAL(38,6))) AS DOUBLE) AS z0
      |  FROM f GROUP BY doc_id),
      |scored AS (
      |  SELECT 1.0 / (1.0 + exp(-(COALESCE(z.z0, 0.0) + $clfB))) AS ss,
      |    CASE WHEN d.n_chars > 2000 THEN 1 ELSE 0 END AS label
      |  FROM documents d LEFT JOIN z ON d.doc_id = z.doc_id),
      |per AS (
      |  SELECT CAST(LEAST(FLOOR(ss * 10), 9) AS BIGINT) AS bucket,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(ss AS DECIMAL(38,6))) AS DOUBLE) AS ssum,
      |    CAST(SUM(CAST(label AS DECIMAL(38,6))) AS DOUBLE) AS lsum
      |  FROM scored GROUP BY 1),
      |t AS (SELECT SUM(n) AS ntot FROM per)
      |SELECT per.bucket, per.n,
      |  round(ssum / per.n, 6) AS conf,
      |  round(lsum / per.n, 6) AS acc,
      |  round(abs(ssum / per.n - lsum / per.n), 6) AS gap,
      |  round(CAST(per.n AS DOUBLE) / t.ntot
      |    * abs(ssum / per.n - lsum / per.n), 6) AS ece_contrib
      |FROM per, t""".stripMargin
    })

  /** q201: exact ROC-AUC of the classifier gate
    * ([[graft.stats.Calibration.rocAuc]]) — the discrimination
    * companion to q200's calibration audit: Mann–Whitney rank
    * statistic with tie-AVERAGED ranks over the q135 sigmoid scores
    * against the same deterministic ground truth. One aggregation +
    * one window over DISTINCT scores; ranks are integers and tie
    * averages exact halves, so AUC and Gini replay bit-for-bit. */
  val q201 = GQuery(
    "q201_roc_auc",
    (s, d) => {
      val docs = documents(s, d)
      val wArr = array(clfW.map(lit): _*)
      val z = graft.stats.HashedLogReg.hashedFeatures(docs, "doc_id", "text",
          dim = 16, salt = "fh")
        .withColumn("__t", element_at(wArr, col("idx").cast("int") + 1) * col("cnt"))
        .groupBy(col("__doc").as("doc_id"))
        .agg(graft.core.Exact.dsum(col("__t")).as("__z0"))
      val scored = docs.join(z, Seq("doc_id"), "left")
        // e6 quantization bounds the rank window at <= 2e6 distinct
        // scores at ANY corpus size (the binned-AUC scale contract)
        .withColumn("score", round(
          lit(1.0) / (lit(1.0) + exp(-(coalesce(col("__z0"), lit(0.0)) + lit(clfB)))), 6))
        .withColumn("label", (col("n_chars") > 2000).cast("int"))
      graft.stats.Calibration.rocAuc(scored, "score", "label")
    },
    Some {
      val wCase = "CASE idx " + clfW.zipWithIndex.map { case (w, i) =>
        s"WHEN $i THEN $w"
      }.mkString(" ") + " END"
      s"""WITH tok AS (SELECT doc_id, unnest($wsSql) AS token FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5('fh-' || token), 1, 7)) AS BIGINT) % 16 AS idx
      |  FROM tok),
      |f AS (SELECT doc_id, idx, COUNT(*) AS cnt FROM h GROUP BY 1, 2),
      |z AS (
      |  SELECT doc_id,
      |    CAST(SUM(CAST(cnt * ($wCase) AS DECIMAL(38,6))) AS DOUBLE) AS z0
      |  FROM f GROUP BY doc_id),
      |scored AS (
      |  SELECT round(1.0 / (1.0 + exp(-(COALESCE(z.z0, 0.0) + $clfB))), 6) AS ss,
      |    CASE WHEN d.n_chars > 2000 THEN 1 ELSE 0 END AS label
      |  FROM documents d LEFT JOIN z ON d.doc_id = z.doc_id),
      |by_s AS (
      |  SELECT ss, COUNT(*) AS n, SUM(label) AS npos
      |  FROM scored GROUP BY ss),
      |ranked AS (
      |  SELECT *, SUM(n) OVER (ORDER BY ss ASC ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM by_s),
      |agg AS (
      |  SELECT SUM(npos) AS n_pos, SUM(n) - SUM(npos) AS n_neg,
      |    CAST(SUM(CAST(npos * (CAST(cum - n + 1 AS DOUBLE) + (n - 1) / 2.0)
      |      AS DECIMAL(38,6))) AS DOUBLE) AS rsum
      |  FROM ranked)
      |, res AS (
      |  SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
      |    round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |      (rsum - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2.0)
      |        / CAST(n_pos * n_neg AS DOUBLE) END, 6) AS auc
      |  FROM agg)
      |SELECT n_pos, n_neg, auc, round(2.0 * auc - 1.0, 6) AS gini FROM res""".stripMargin
    })

  /** q136: reciprocal-rank fusion ([[graft.text.Fusion.rrf]]) —
    * hybrid retrieval merging the q112 BM25 relevance ranking with a
    * per-language quality prior (n_chars desc — a stand-in for any
    * score-incomparable second system). Only ranks cross the system
    * boundary; contributions are e9-floored integers, so the fused
    * order is an int64 sum both engines replay exactly. */
  val q136 = GQuery(
    "q136_hybrid_rrf",
    (s, d) => {
      import graft.text.{Bm25, Fusion}
      val docs = documents(s, d)
      val toks = docs.select(col("doc_id"), col("lang"),
        explode(Bm25.tokens(col("text"))).as("term"))
      val ldf = toks.select(col("doc_id"), col("lang"), col("term")).distinct()
        .groupBy(col("lang"), col("term")).agg(lcount(lit(1)).as("ldf"))
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("ldf").desc, col("term").asc)
      val qt = ldf.withColumn("r", row_number().over(wq)).filter(col("r") <= 3)
        .select(col("lang"), col("term"))
      val bm25 = Bm25.retrieve(docs, "doc_id", "text", qt, "lang", "term", k = 5)
      val wl = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id").asc)
      val quality = docs
        .withColumn("rank", row_number().over(wl).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("lang"), col("doc_id"), col("rank"))
      Fusion.rrf(Seq(bm25, quality), "lang", "doc_id", c = 60L, k = 5)
    },
    Some(s"""WITH $bm25CtesSql,
      |bm25r AS (
      |  SELECT lang, doc_id, r AS rank
      |  FROM (SELECT lang, doc_id,
      |          row_number() OVER (PARTITION BY lang
      |                             ORDER BY bm25_e9 DESC, doc_id ASC) AS r
      |        FROM sc)
      |  WHERE r <= 5),
      |qualr AS (
      |  SELECT lang, doc_id, r AS rank
      |  FROM (SELECT lang, doc_id,
      |          row_number() OVER (PARTITION BY lang
      |                             ORDER BY n_chars DESC, doc_id ASC) AS r
      |        FROM documents)
      |  WHERE r <= 5),
      |un AS (
      |  SELECT lang, doc_id,
      |    CAST(floor(1e9 / (60 + rank) + 0.5) AS BIGINT) AS c FROM bm25r
      |  UNION ALL
      |  SELECT lang, doc_id,
      |    CAST(floor(1e9 / (60 + rank) + 0.5) AS BIGINT) AS c FROM qualr),
      |fused AS (
      |  SELECT lang, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_e9,
      |    CAST(COUNT(*) AS BIGINT) AS n_systems
      |  FROM un GROUP BY 1, 2)
      |SELECT lang, CAST(rn AS BIGINT) AS rank, doc_id, rrf_e9, n_systems
      |FROM (SELECT lang, doc_id, rrf_e9, n_systems,
      |        row_number() OVER (PARTITION BY lang
      |                           ORDER BY rrf_e9 DESC, doc_id ASC) AS rn
      |      FROM fused)
      |WHERE rn <= 5""".stripMargin))

  /** q137: blocklist tagging
    * ([[graft.text.QualityFilters.blocklistTag]]) — the badwords pass:
    * per language, documents carrying blocklist terms, the distinct-
    * term and occurrence tallies, and the flagged character mass (the
    * removal bill). The blocklist is a plan literal (array_intersect /
    * filter, codegen'd, no explode-join); the oracle replays matching
    * through its token table — same result, different legal shape. */
  private val blockTerms = Seq("slow", "leak", "crash")

  val q137 = GQuery(
    "q137_blocklist_filter",
    (s, d) =>
      graft.text.QualityFilters.blocklistTag(documents(s, d), "text", blockTerms)
        .groupBy(col("lang"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          sum(when(col("n_block_terms") > 0, 1L).otherwise(0L)).as("n_flagged"),
          sum(col("n_block_terms")).as("block_terms"),
          sum(col("n_block_hits")).as("block_hits"),
          sum(when(col("n_block_terms") > 0, col("n_chars")).otherwise(0L))
            .as("flagged_chars")),
    Some {
      val inList = blockTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH tok AS (SELECT doc_id, unnest($wsSql) AS token FROM documents),
      |hits AS (
      |  SELECT doc_id, COUNT(DISTINCT token) AS dh, COUNT(*) AS oc
      |  FROM tok WHERE token IN ($inList) GROUP BY doc_id)
      |SELECT d.lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN h.dh > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  CAST(SUM(COALESCE(h.dh, 0)) AS BIGINT) AS block_terms,
      |  CAST(SUM(COALESCE(h.oc, 0)) AS BIGINT) AS block_hits,
      |  CAST(SUM(CASE WHEN h.dh > 0 THEN d.n_chars ELSE 0 END) AS BIGINT) AS flagged_chars
      |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      |GROUP BY d.lang""".stripMargin
    })

  /** q139: the Gopher document-quality rule bundle
    * ([[graft.text.GopherRules]], Rae et al. 2021 table A1) — seven
    * per-document rules + the keep conjunction as ONE codegen'd
    * projection, censused per source. The fixture mutates `text` by
    * doc_id residue so every rule fires both ways (truncation → word
    * count; a 20-char-word wall → mean word length; digit words →
    * alphabetic fraction; bullet / ellipsis line walls; a '#' wall →
    * symbol ratio; a stopword preamble → required stopwords). */
  val q139 = GQuery(
    "q139_gopher_rules",
    (s, d) => {
      val m = col("doc_id") % 11
      val text2 =
        when(m === 0, concat_ws(" ", slice(wsTokens(col("text")), 1, 5)))
          .when(m === 1, repeat(lit("abcdefghijklmnopqrst "), 60))
          .when(m === 2, repeat(lit("123 456 789 "), 30))
          .when(m === 3, concat(repeat(lit("- bullet point\n"), 20), lit("tail line")))
          .when(m === 4, repeat(lit("trailing line...\n"), 20))
          .when(m === 5, concat(repeat(lit("# "), 80), col("text")))
          .when(m === 6, concat(lit("the be to of and that have with "), col("text")))
          .otherwise(col("text"))
      val fixture = graft.core.Widen.widen(
        documents(s, d).select(col("source"), text2.as("text")))
      graft.text.GopherRules.flags(fixture, "text")
        .groupBy(col("source"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          lcount(when(col("r_word_count"), 1)).as("n_wc"),
          lcount(when(col("r_word_len"), 1)).as("n_wl"),
          lcount(when(col("r_symbol_ratio"), 1)).as("n_sym"),
          lcount(when(col("r_bullet_lines"), 1)).as("n_bul"),
          lcount(when(col("r_ellipsis_lines"), 1)).as("n_ell"),
          lcount(when(col("r_alpha_words"), 1)).as("n_alpha"),
          lcount(when(col("r_stopwords"), 1)).as("n_stop"),
          lcount(when(col("keep"), 1)).as("n_keep"))
    },
    Some(s"""WITH f AS (
      |  SELECT source,
      |    CASE
      |      WHEN doc_id % 11 = 0 THEN array_to_string(($wsSql)[1:5], ' ')
      |      WHEN doc_id % 11 = 1 THEN repeat('abcdefghijklmnopqrst ', 60)
      |      WHEN doc_id % 11 = 2 THEN repeat('123 456 789 ', 30)
      |      WHEN doc_id % 11 = 3 THEN repeat('- bullet point' || chr(10), 20) || 'tail line'
      |      WHEN doc_id % 11 = 4 THEN repeat('trailing line...' || chr(10), 20)
      |      WHEN doc_id % 11 = 5 THEN repeat('# ', 80) || text
      |      WHEN doc_id % 11 = 6 THEN 'the be to of and that have with ' || text
      |      ELSE text END AS t2
      |  FROM documents),
      |g AS (
      |  SELECT source, t2,
      |    string_split_regex(trim(t2), '\\s+') AS ws,
      |    string_split(t2, chr(10)) AS lines
      |  FROM f),
      |r AS (
      |  SELECT source,
      |    len(ws) AS nw,
      |    list_sum(list_transform(ws, x -> length(x))) AS swl,
      |    len(regexp_extract_all(t2, '#|\\.\\.\\.')) AS nsym,
      |    len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS nbul,
      |    len(list_filter(lines, l -> regexp_matches(trim(l), '\\.\\.\\.$$'))) AS nell,
      |    len(lines) AS nl,
      |    len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS nalpha,
      |    len(list_filter(['the','be','to','of','and','that','have','with'],
      |      s -> list_contains(ws, s))) AS nstop
      |  FROM g)
      |SELECT source, COUNT(*) AS n_docs,
      |  COUNT(CASE WHEN nw BETWEEN 50 AND 100000 THEN 1 END) AS n_wc,
      |  COUNT(CASE WHEN swl >= 3 * nw AND swl <= 10 * nw THEN 1 END) AS n_wl,
      |  COUNT(CASE WHEN 10 * nsym <= nw THEN 1 END) AS n_sym,
      |  COUNT(CASE WHEN 10 * nbul <= 9 * nl THEN 1 END) AS n_bul,
      |  COUNT(CASE WHEN 10 * nell <= 3 * nl THEN 1 END) AS n_ell,
      |  COUNT(CASE WHEN 5 * nalpha >= 4 * nw THEN 1 END) AS n_alpha,
      |  COUNT(CASE WHEN nstop >= 2 THEN 1 END) AS n_stop,
      |  COUNT(CASE WHEN nw BETWEEN 50 AND 100000
      |    AND swl >= 3 * nw AND swl <= 10 * nw
      |    AND 10 * nsym <= nw
      |    AND 10 * nbul <= 9 * nl
      |    AND 10 * nell <= 3 * nl
      |    AND 5 * nalpha >= 4 * nw
      |    AND nstop >= 2 THEN 1 END) AS n_keep
      |FROM r GROUP BY source""".stripMargin))

  /** q140: the C4 line-level cleaning rules ([[graft.text.C4Filters]],
    * Raffel et al. 2020 §2.2) — terminal-punctuation / min-words /
    * boilerplate-phrase line drops plus the lorem-ipsum / curly-brace /
    * too-few-lines document drops, with the cleaned bytes pinned by an
    * md5-prefix checksum. The fixture builds line-structured text per
    * doc_id residue (the corpus itself is line-less) and appends a
    * content-derived trailing line so per-document variety flows from
    * the data, not just the residue. */
  val q140 = GQuery(
    "q140_c4_line_filter",
    (s, d) => {
      val m = col("doc_id") % 7
      val good3 = "Good first line.\nAnother good line here!\nThird fine line?"
      val tailLine = concat(concat_ws(" ", slice(wsTokens(col("text")), 1, 6)), lit("."))
      val text2 =
        when(m === 0, concat(lit(good3 + "\n"), tailLine))
          .when(m === 1, lit("no punctuation line\nanother bare line"))
          .when(m === 2, lit("Ok line one.\nTiny line.\nThis survives fine."))
          .when(m === 3, concat(lit("Check our Cookie Policy today.\n" + good3 + "\n"), tailLine))
          .when(m === 4, lit("lorem ipsum dolor sit amet.\n" + good3))
          .when(m === 5, lit("function f() { return 1; }\n" + good3))
          .otherwise(concat(lit("He said \"indeed\".\n" + good3 + "\n"), tailLine))
      val fixture = graft.core.Widen.widen(
        documents(s, d).select(col("source"), text2.as("text")))
      graft.text.C4Filters.clean(fixture, "text")
        .groupBy(col("source"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          sum(col("n_lines")).as("lines_in"),
          sum(col("n_kept_lines")).as("lines_kept"),
          lcount(when(col("doc_dropped"), 1)).as("n_dropped"),
          sum(conv(substring(md5(col("cleaned")), 1, 7), 16, 10).cast("long"))
            .as("checksum"))
    },
    Some(s"""WITH f AS (
      |  SELECT source,
      |    CASE
      |      WHEN doc_id % 7 = 0 THEN
      |        'Good first line.' || chr(10) || 'Another good line here!' || chr(10) ||
      |        'Third fine line?' || chr(10) || array_to_string(($wsSql)[1:6], ' ') || '.'
      |      WHEN doc_id % 7 = 1 THEN 'no punctuation line' || chr(10) || 'another bare line'
      |      WHEN doc_id % 7 = 2 THEN 'Ok line one.' || chr(10) || 'Tiny line.' || chr(10) ||
      |        'This survives fine.'
      |      WHEN doc_id % 7 = 3 THEN 'Check our Cookie Policy today.' || chr(10) ||
      |        'Good first line.' || chr(10) || 'Another good line here!' || chr(10) ||
      |        'Third fine line?' || chr(10) || array_to_string(($wsSql)[1:6], ' ') || '.'
      |      WHEN doc_id % 7 = 4 THEN 'lorem ipsum dolor sit amet.' || chr(10) ||
      |        'Good first line.' || chr(10) || 'Another good line here!' || chr(10) ||
      |        'Third fine line?'
      |      WHEN doc_id % 7 = 5 THEN 'function f() { return 1; }' || chr(10) ||
      |        'Good first line.' || chr(10) || 'Another good line here!' || chr(10) ||
      |        'Third fine line?'
      |      ELSE 'He said "indeed".' || chr(10) ||
      |        'Good first line.' || chr(10) || 'Another good line here!' || chr(10) ||
      |        'Third fine line?' || chr(10) || array_to_string(($wsSql)[1:6], ' ') || '.'
      |    END AS t2
      |  FROM documents),
      |g AS (
      |  SELECT source, t2,
      |    string_split(t2, chr(10)) AS lines,
      |    list_filter(string_split(t2, chr(10)), l ->
      |      regexp_matches(trim(l), '[.!?"]$$')
      |      AND len(string_split_regex(trim(l), '\\s+')) >= 3
      |      AND NOT (contains(lower(trim(l)), 'javascript')
      |        OR contains(lower(trim(l)), 'cookie policy')
      |        OR contains(lower(trim(l)), 'privacy policy')
      |        OR contains(lower(trim(l)), 'terms of use'))) AS kept
      |  FROM f),
      |r AS (
      |  SELECT source, len(lines) AS nl, len(kept) AS nk,
      |    (contains(lower(t2), 'lorem ipsum') OR contains(t2, '{')
      |      OR contains(t2, '}') OR len(kept) < 3) AS dropped,
      |    CASE WHEN (contains(lower(t2), 'lorem ipsum') OR contains(t2, '{')
      |      OR contains(t2, '}') OR len(kept) < 3)
      |      THEN '' ELSE array_to_string(kept, chr(10)) END AS cleaned
      |  FROM g)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(nl) AS BIGINT) AS lines_in,
      |  CAST(SUM(nk) AS BIGINT) AS lines_kept,
      |  COUNT(CASE WHEN dropped THEN 1 END) AS n_dropped,
      |  CAST(SUM(CAST(('0x' || substr(md5(cleaned), 1, 7)) AS BIGINT)) AS BIGINT) AS checksum
      |FROM r GROUP BY source""".stripMargin))

  /** q141: the LLM curation DAG composed end-to-end — C4 line cleaning
    * → curation (NFC → PII redaction → exact-dedup canonical election →
    * min-token gate) → exact duplicate-span self-dedup → corpus bill.
    * The LLM-side counterpart of the fisheries DAG's q95: each stage is
    * oracle-gated alone (q140, q110/q106/q111, q138); this entry puts
    * the stage HANDOFFS (drop propagation, redacted-text fingerprints,
    * span masking over the post-curation corpus) under one hash gate
    * and tracks the composition's cost in the bench. The per-stage
    * verdict frames meet in id-keyed left joins; the c4 and curation
    * stages are materialized ONCE at their handoffs (lazy
    * localCheckpoint — measured 3.4 s → 2.1 s at sf0.1 vs re-deriving
    * the regex battery per consumer), mirroring the versioned artifact
    * store each production stage lands in between jobs (S15). */
  val q141 = GQuery(
    "q141_llm_curation_dag",
    (s, d) => {
      val m = col("doc_id") % 5
      val good3 = "Good first line.\nAnother good line here!\nThird fine line?"
      val tailLine = concat(concat_ws(" ", slice(wsTokens(col("text")), 1, 6)), lit("."))
      val txt =
        when(m === 0, concat(
          lit("Café contact bob@example.org for details.\n" + good3 + "\n"), tailLine))
          .when(m === 1, lit("no punctuation line\nbare line"))
          .when(m === 2, lit("Shared duplicate body text here.\n" + good3))
          .when(m === 3, concat(
            lit("common repeated span sentence with exactly eight tokens.\n" + good3 + "\n"),
            tailLine))
          .otherwise(concat(lit(good3 + "\n"), tailLine))
      val fixture = graft.core.Widen.widen(
        documents(s, d).select(col("doc_id"), txt.as("txt")))
      val c4 = graft.text.C4Filters.clean(fixture, "txt").localCheckpoint(false)
      val cur = graft.text.Curation.curate(
        c4.filter(!col("doc_dropped"))
          .select(col("doc_id"), col("cleaned").as("txt")),
        "doc_id", "txt", minTokens = 8).localCheckpoint(false)
      val sd = graft.dedup.Dedup.selfSpanDedup(
        cur.filter(col("kept")).select(col("doc_id"), col("redacted")),
        "doc_id", "redacted", n = 8)
      c4.select(col("doc_id"), col("doc_dropped"))
        .join(cur.select(col("doc_id"), col("is_canonical"), col("kept"),
          col("n_emails")), Seq("doc_id"), "left")
        .join(sd.select(col("doc").as("doc_id"), col("n_tokens"),
          col("n_removed"), col("clean_text")), Seq("doc_id"), "left")
        .agg(
          lcount(lit(1)).as("n_docs_in"),
          lcount(when(col("doc_dropped"), 1)).as("n_c4_dropped"),
          lcount(when(col("is_canonical") === false, 1)).as("n_dup_rows"),
          lcount(when(col("kept"), 1)).as("n_kept"),
          sum(col("n_emails")).as("pii_emails"),
          sum(col("n_tokens") - col("n_removed")).as("final_tokens"),
          sum(col("n_removed")).as("span_removed"),
          sum(conv(substring(md5(col("clean_text")), 1, 7), 16, 10)
            .cast("long")).as("checksum"))
    },
    Some(s"""WITH f AS (
      |  SELECT doc_id,
      |    CASE
      |      WHEN doc_id % 5 = 0 THEN
      |        'Cafe' || chr(769) || ' contact bob@example.org for details.' || chr(10) ||
      |        'Good first line.' || chr(10) || 'Another good line here!' || chr(10) ||
      |        'Third fine line?' || chr(10) || array_to_string(($wsSql)[1:6], ' ') || '.'
      |      WHEN doc_id % 5 = 1 THEN 'no punctuation line' || chr(10) || 'bare line'
      |      WHEN doc_id % 5 = 2 THEN 'Shared duplicate body text here.' || chr(10) ||
      |        'Good first line.' || chr(10) || 'Another good line here!' || chr(10) ||
      |        'Third fine line?'
      |      WHEN doc_id % 5 = 3 THEN
      |        'common repeated span sentence with exactly eight tokens.' || chr(10) ||
      |        'Good first line.' || chr(10) || 'Another good line here!' || chr(10) ||
      |        'Third fine line?' || chr(10) || array_to_string(($wsSql)[1:6], ' ') || '.'
      |      ELSE 'Good first line.' || chr(10) || 'Another good line here!' || chr(10) ||
      |        'Third fine line?' || chr(10) || array_to_string(($wsSql)[1:6], ' ') || '.'
      |    END AS txt
      |  FROM documents),
      |c4 AS (
      |  SELECT doc_id, txt,
      |    list_filter(string_split(txt, chr(10)), l ->
      |      regexp_matches(trim(l), '[.!?"]$$')
      |      AND len(string_split_regex(trim(l), '\\s+')) >= 3
      |      AND NOT (contains(lower(trim(l)), 'javascript')
      |        OR contains(lower(trim(l)), 'cookie policy')
      |        OR contains(lower(trim(l)), 'privacy policy')
      |        OR contains(lower(trim(l)), 'terms of use'))) AS kept_lines
      |  FROM f),
      |c4r AS (
      |  SELECT doc_id,
      |    (contains(lower(txt), 'lorem ipsum') OR contains(txt, '{')
      |      OR contains(txt, '}') OR len(kept_lines) < 3) AS doc_dropped,
      |    array_to_string(kept_lines, chr(10)) AS cleaned
      |  FROM c4),
      |nfc AS (
      |  SELECT doc_id, nfc_normalize(cleaned) AS t2
      |  FROM c4r WHERE NOT doc_dropped),
      |pii AS (
      |  SELECT doc_id,
      |    len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(t2,
      |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |        '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
      |      '\\+?\\d{1,3}-\\d{3}-\\d{3,4}', '<PHONE>', 'g') AS red
      |  FROM nfc),
      |keeper AS (
      |  SELECT md5(red) AS fp, MIN(doc_id) AS keep_id
      |  FROM pii GROUP BY md5(red)),
      |cur AS (
      |  SELECT p.doc_id, p.n_emails, p.red,
      |    p.doc_id = k.keep_id AS is_canonical,
      |    (p.doc_id = k.keep_id
      |      AND len(string_split_regex(trim(p.red), '\\s+')) >= 8) AS kept
      |  FROM pii p JOIN keeper k ON md5(p.red) = k.fp),
      |sdt AS (SELECT doc_id, string_split_regex(trim(red), '\\s+') AS ws
      |  FROM cur WHERE kept),
      |sg AS (
      |  SELECT doc_id, u.i AS i, array_to_string(ws[u.i:u.i+7], ' ') AS gram
      |  FROM sdt, UNNEST(generate_series(1, len(ws) - 7)) AS u(i)),
      |sr AS (
      |  SELECT doc_id, i,
      |    COUNT(*) OVER (PARTITION BY gram) AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn
      |  FROM sg),
      |smask AS (
      |  SELECT DISTINCT doc_id, u.p - 1 AS pos
      |  FROM sr, UNNEST(generate_series(i, i + 7)) AS u(p)
      |  WHERE cnt > 1 AND rn > 1),
      |stoks AS (
      |  SELECT doc_id, u.i - 1 AS pos, ws[u.i] AS tok
      |  FROM sdt, UNNEST(generate_series(1, len(ws))) AS u(i)),
      |skept AS (
      |  SELECT tk.doc_id, tk.pos, tk.tok
      |  FROM stoks tk LEFT JOIN smask m2 ON tk.doc_id = m2.doc_id AND tk.pos = m2.pos
      |  WHERE m2.pos IS NULL),
      |snrem AS (SELECT doc_id, COUNT(*) AS n_removed FROM smask GROUP BY doc_id),
      |sreb AS (
      |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
      |  FROM skept GROUP BY doc_id),
      |sd AS (
      |  SELECT t.doc_id, CAST(len(t.ws) AS BIGINT) AS n_tokens,
      |    CAST(COALESCE(nr.n_removed, 0) AS BIGINT) AS n_removed,
      |    COALESCE(rb.clean_text, '') AS clean_text
      |  FROM sdt t
      |  LEFT JOIN snrem nr ON t.doc_id = nr.doc_id
      |  LEFT JOIN sreb rb ON t.doc_id = rb.doc_id)
      |SELECT COUNT(*) AS n_docs_in,
      |  COUNT(CASE WHEN c.doc_dropped THEN 1 END) AS n_c4_dropped,
      |  COUNT(CASE WHEN cu.is_canonical = FALSE THEN 1 END) AS n_dup_rows,
      |  COUNT(CASE WHEN cu.kept THEN 1 END) AS n_kept,
      |  CAST(SUM(cu.n_emails) AS BIGINT) AS pii_emails,
      |  CAST(SUM(s.n_tokens - s.n_removed) AS BIGINT) AS final_tokens,
      |  CAST(SUM(s.n_removed) AS BIGINT) AS span_removed,
      |  CAST(SUM(CAST(('0x' || substr(md5(s.clean_text), 1, 7)) AS BIGINT)) AS BIGINT) AS checksum
      |FROM c4r c
      |LEFT JOIN cur cu ON c.doc_id = cu.doc_id
      |LEFT JOIN sd s ON c.doc_id = s.doc_id""".stripMargin))

  /** q179: compression-ratio quality census
    * ([[graft.functions.DeflateLen]]) — the zlib repetitiveness filter
    * web curation runs beside the n-gram stats (q96): LZ77's 32 KB
    * window catches long-range template structure bounded n-gram
    * windows cannot. ratio = deflated/original bytes; < 0.35 flags
    * templated spam, > 0.9 high-entropy noise. DEFLATE is not
    * SQL-replayable, so the oracle PINS the per-doc deflated lengths
    * as literal rows (the q161 pinned-winners pattern) and replays
    * only the arithmetic on top; the pins were computed with an
    * INDEPENDENT implementation (CPython zlib, raw DEFLATE level 6,
    * wbits=-15) and verified equal to the JDK Deflater on every
    * sf0.01 document, so the gate cross-checks two zlib front ends.
    * DeflateRatioSpec pins ordering properties and determinism. */
  val q179 = GQuery(
    "q179_compression_ratio",
    (s, d) => {
      graft.functions.DeflateLen.register(s)
      val docs = graft.core.Widen.widen(documents(s, d))
      docs.select(col("lang"),
          (expr("deflate_len(text)").cast("double") /
            octet_length(col("text")).cast("double")).as("ratio"))
        .groupBy(col("lang"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          sum(when(col("ratio") < 0.35, 1L).otherwise(0L)).as("n_templated"),
          sum(when(col("ratio") > 0.9, 1L).otherwise(0L)).as("n_noise"),
          round(lavg6(col("ratio")), 6).as("avg_ratio"))
    },
    Some(s"""WITH dl(doc_id, dlen) AS (
      |  SELECT * FROM (VALUES
      |    (0,93),(1,175),(2,127),(3,93),(4,133),(5,156),(6,58),(7,180),(8,195),(9,174),(10,118),(11,146),
      |    (12,158),(13,158),(14,202),(15,122),(16,69),(17,188),(18,185),(19,52),(20,173),(21,115),(22,194),(23,103),
      |    (24,207),(25,206),(26,55),(27,164),(28,159),(29,110),(30,104),(31,130),(32,211),(33,125),(34,105),(35,191),
      |    (36,81),(37,165),(38,109),(39,86),(40,180),(41,159),(42,144),(43,100),(44,82),(45,189),(46,192),(47,126),
      |    (48,96),(49,126),(50,127),(51,162),(52,56),(53,108),(54,166),(55,105),(56,219),(57,196),(58,173),(59,78),
      |    (60,207),(61,144),(62,172),(63,213),(64,85),(65,70),(66,164),(67,160),(68,103),(69,151),(70,214),(71,160),
      |    (72,126),(73,207),(74,38),(75,147),(76,171),(77,154),(78,128),(79,55),(80,103),(81,167),(82,134),(83,68),
      |    (84,171),(85,95),(86,88),(87,87),(88,139),(89,84),(90,82),(91,188),(92,93),(93,80),(94,86),(95,144),
      |    (96,182),(97,153),(98,213),(99,116),(100,202),(101,123),(102,199),(103,211),(104,125),(105,158),(106,61),(107,118),
      |    (108,61),(109,178),(110,49),(111,217),(112,153),(113,186),(114,109),(115,90),(116,53),(117,126),(118,176),(119,71),
      |    (120,116),(121,107),(122,75),(123,93),(124,148),(125,107),(126,199),(127,189),(128,195),(129,185),(130,94),(131,148),
      |    (132,163),(133,209),(134,89),(135,219),(136,153),(137,124),(138,170),(139,142),(140,99),(141,180),(142,217),(143,174),
      |    (144,69),(145,179),(146,84),(147,197),(148,101),(149,96),(150,135),(151,210),(152,116),(153,184),(154,191),(155,171),
      |    (156,83),(157,69),(158,72),(159,175),(160,123),(161,198),(162,196),(163,132),(164,78),(165,80),(166,158),(167,204),
      |    (168,119),(169,166),(170,81),(171,159),(172,74),(173,223),(174,153),(175,97),(176,202),(177,137),(178,113),(179,198),
      |    (180,112),(181,77),(182,165),(183,76),(184,194),(185,141),(186,178),(187,205),(188,133),(189,115),(190,190),(191,82),
      |    (192,83),(193,104),(194,101),(195,154),(196,161),(197,212),(198,129),(199,98),(200,145),(201,159),(202,196),(203,83),
      |    (204,78),(205,173),(206,83),(207,176),(208,76),(209,118),(210,209),(211,138),(212,128),(213,201),(214,58),(215,216),
      |    (216,218),(217,166),(218,193),(219,94),(220,224),(221,127),(222,134),(223,195),(224,187),(225,185),(226,77),(227,197),
      |    (228,201),(229,173),(230,151),(231,95),(232,154),(233,197),(234,159),(235,122),(236,54),(237,178),(238,130),(239,100),
      |    (240,177),(241,206),(242,178),(243,104),(244,168),(245,193),(246,101),(247,183),(248,193),(249,193),(250,130),(251,215),
      |    (252,132),(253,110),(254,70),(255,89),(256,54),(257,79),(258,180),(259,128),(260,84),(261,200),(262,129),(263,196),
      |    (264,226),(265,134),(266,121),(267,184),(268,115),(269,200),(270,208),(271,148),(272,212),(273,97),(274,220),(275,43),
      |    (276,218),(277,91),(278,173),(279,138),(280,209),(281,94),(282,104),(283,194),(284,140),(285,214),(286,134),(287,72),
      |    (288,103),(289,110),(290,214),(291,183),(292,188),(293,170),(294,201),(295,108),(296,163),(297,154),(298,110),(299,213),
      |    (300,117),(301,212),(302,203),(303,196),(304,122),(305,50),(306,183),(307,151),(308,74),(309,127),(310,89),(311,209),
      |    (312,164),(313,60),(314,118),(315,195),(316,182),(317,175),(318,194),(319,203),(320,182),(321,145),(322,132),(323,161),
      |    (324,121),(325,158),(326,113),(327,104),(328,213),(329,160),(330,157),(331,141),(332,113),(333,109),(334,203),(335,150),
      |    (336,175),(337,130),(338,69),(339,106),(340,130),(341,192),(342,76),(343,92),(344,190),(345,155),(346,181),(347,137),
      |    (348,89),(349,189),(350,195),(351,167),(352,217),(353,154),(354,189),(355,150),(356,164),(357,130),(358,51),(359,152),
      |    (360,189),(361,166),(362,65),(363,161),(364,136),(365,59),(366,143),(367,121),(368,54),(369,142),(370,118),(371,165),
      |    (372,95),(373,180),(374,106),(375,155),(376,167),(377,128),(378,165),(379,177),(380,192),(381,155),(382,88),(383,132),
      |    (384,72),(385,177),(386,203),(387,116),(388,159),(389,91),(390,86),(391,129),(392,87),(393,193),(394,173),(395,189),
      |    (396,132),(397,138),(398,77),(399,152),(400,90),(401,184),(402,100),(403,202),(404,123),(405,151),(406,192),(407,75),
      |    (408,65),(409,140),(410,186),(411,188),(412,174),(413,186),(414,180),(415,155),(416,144),(417,213),(418,183),(419,85),
      |    (420,191),(421,192),(422,167),(423,171),(424,180),(425,86),(426,196),(427,180),(428,142),(429,220),(430,182),(431,152),
      |    (432,169),(433,108),(434,187),(435,106),(436,131),(437,192),(438,106),(439,110),(440,128),(441,218),(442,195),(443,140),
      |    (444,182),(445,149),(446,84),(447,212),(448,140),(449,106),(450,92),(451,78),(452,168),(453,221),(454,89),(455,53),
      |    (456,79),(457,115),(458,158),(459,175),(460,140),(461,174),(462,159),(463,212),(464,113),(465,157),(466,206),(467,166),
      |    (468,115),(469,48),(470,128),(471,158),(472,112),(473,149),(474,170),(475,64),(476,65),(477,87),(478,144),(479,167),
      |    (480,158),(481,61),(482,98),(483,133),(484,123),(485,91),(486,108),(487,155),(488,115),(489,149),(490,141),(491,170),
      |    (492,62),(493,195),(494,111),(495,172),(496,190),(497,81),(498,198),(499,98)) t(doc_id, dlen)),
      |r AS (
      |  SELECT d.lang,
      |    CAST(dl.dlen AS DOUBLE) / CAST(strlen(d.text) AS DOUBLE) AS ratio
      |  FROM documents d JOIN dl ON d.doc_id = dl.doc_id)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN ratio < 0.35 THEN 1 ELSE 0 END) AS BIGINT) AS n_templated,
      |  CAST(SUM(CASE WHEN ratio > 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_noise,
      |  round(${graft.core.Exact.sqlLavg6("ratio")}, 6) AS avg_ratio
      |FROM r GROUP BY lang""".stripMargin))

  /** q189: sentence-boundary chunking
    * ([[graft.text.Chunking.sentenceChunks]]) — the RAG splitter next
    * to q98/q99's token windows: sentences pack greedily into ≤ 64-
    * token chunks, oversize single sentences stand alone rather than
    * splitting mid-sentence. The greedy fill is a per-document ordered
    * fold; the oracle replays it as a recursive per-sentence chain, so
    * chunk boundaries themselves sit under the hash gate. */
  val q189 = GQuery(
    "q189_sentence_chunks",
    (s, d) => {
      val docs = documents(s, d)
      graft.text.Chunking.sentenceChunks(docs, "doc_id", "text", maxTokens = 64)
        .join(broadcast(docs.select(col("doc_id").as("doc"), col("lang"))), Seq("doc"))
        .groupBy(col("lang"))
        .agg(
          countDistinct(col("doc")).cast("long").as("n_docs"),
          lcount(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).as("tokens_total"),
          max(col("n_tokens")).as("max_chunk_tokens"),
          count(when(col("n_tokens") > 64, 1)).as("n_oversize"))
    },
    Some("""WITH RECURSIVE sraw AS (
      |  SELECT doc_id, lang, regexp_extract_all(text, '[^.!?]+[.!?]*') AS arr
      |  FROM documents),
      |se AS (
      |  SELECT doc_id, lang, arr[i] AS sent, i AS i0
      |  FROM sraw, UNNEST(generate_series(1, len(arr))) u(i)
      |  WHERE length(trim(arr[i])) > 0),
      |sc AS (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i0) AS idx,
      |    CAST(len(string_split_regex(trim(sent), '\s+')) AS BIGINT) AS n
      |  FROM se),
      |rec AS (
      |  SELECT doc_id, lang, idx, n, n AS fill, CAST(0 AS BIGINT) AS cid
      |  FROM sc WHERE idx = 1
      |  UNION ALL
      |  SELECT s.doc_id, s.lang, s.idx, s.n,
      |    CASE WHEN r.fill + s.n <= 64 THEN r.fill + s.n ELSE s.n END,
      |    CASE WHEN r.fill + s.n <= 64 THEN r.cid ELSE r.cid + 1 END
      |  FROM rec r JOIN sc s ON s.doc_id = r.doc_id AND s.idx = r.idx + 1),
      |ch AS (
      |  SELECT doc_id, lang, cid, COUNT(*) AS n_s, CAST(SUM(n) AS BIGINT) AS n_t
      |  FROM rec GROUP BY 1, 2, 3)
      |SELECT lang,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  COUNT(*) AS n_chunks,
      |  CAST(SUM(n_t) AS BIGINT) AS tokens_total,
      |  CAST(MAX(n_t) AS BIGINT) AS max_chunk_tokens,
      |  COUNT(CASE WHEN n_t > 64 THEN 1 END) AS n_oversize
      |FROM ch GROUP BY lang""".stripMargin))

  /** q236: phrase-blocklist census by Aho–Corasick
    * ([[graft.functions.AcCounts]]) — the multi-phrase substring
    * counterpart of q137's exact-token blocklist: boilerplate PHRASES
    * (multi-word, overlapping, prefix-sharing) counted in ONE automaton
    * pass per document regardless of dictionary size, where per-pattern
    * scans cost O(chars·patterns). Per-pattern corpus census: documents
    * hit, total (overlapping) occurrences. The oracle counts per
    * position (substr equality at every offset), so overlap semantics
    * are pinned exactly. */
  val q236 = {
    val dict = Seq("sort merge", "merge", "table scan", "scan",
      "batch batch", "data line")
    GQuery(
      "q236_phrase_blocklist",
      (s, d) => {
        graft.functions.AcCounts.register(s)
        val pats = map(dict.zipWithIndex
          .flatMap { case (p, i) => Seq(lit(i), lit(p)) }: _*)
        documents(s, d)
          .select(col("doc_id"),
            call_function("ac_counts", col("text"),
              array(dict.map(lit): _*)).as("__c"))
          .select(col("doc_id"), posexplode(col("__c")).as(Seq("pid", "c")))
          .groupBy(col("pid"))
          .agg(
            sum(when(col("c") > 0, lit(1L)).otherwise(lit(0L))).as("n_docs_hit"),
            sum(col("c")).as("n_hits"))
          .select(col("pid"), element_at(pats, col("pid")).as("pattern"),
            col("n_docs_hit"), col("n_hits"))
      },
      Some(s"""WITH pats AS (
        |  SELECT * FROM (VALUES ${dict.zipWithIndex
             .map { case (p, i) => s"($i, '$p')" }.mkString(", ")})
        |    AS t(pid, pattern)),
        |hits AS (
        |  SELECT d.doc_id, p.pid,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents d, pats p,
        |    UNNEST(generate_series(1,
        |      GREATEST(length(d.text) - length(p.pattern) + 1, 0))) AS u(i)
        |  WHERE substr(d.text, i, length(p.pattern)) = p.pattern
        |  GROUP BY 1, 2)
        |SELECT p.pid, p.pattern,
        |  CAST(COUNT(h.doc_id) AS BIGINT) AS n_docs_hit,
        |  CAST(COALESCE(SUM(h.c), 0) AS BIGINT) AS n_hits
        |FROM pats p LEFT JOIN hits h ON p.pid = h.pid
        |GROUP BY p.pid, p.pattern""".stripMargin))
  }

  /** q244: paired bootstrap system comparison
    * ([[graft.stats.Bootstrap.pairedComparison]], Koehn '04 shape) —
    * is full-text language ID significantly better than langid on the
    * first 50 chars, ON THE SAME documents? Per-doc correctness
    * indicators pair into deltas; one Poisson weight per (doc,
    * resample) preserves the pairing; output is the point accuracy
    * delta, its 95% CI, and the resample win count (the bootstrap
    * P(A > B)). Every resample mean replays in SQL through the shared
    * inverse-CDF literals, so significance itself is hash-gated. */
  val q244 = GQuery(
    "q244_paired_bootstrap",
    (s, d) => {
      val docs = documents(s, d)
      val scored = docs.select(col("doc_id"),
        (predictLang(wsTokens(col("text")))
          === col("lang")).cast("int").as("a_full"),
        (predictLang(wsTokens(substring(col("text"), 1, 50)))
          === col("lang")).cast("int").as("b_trunc"))
      graft.stats.Bootstrap.pairedComparison(scored, "doc_id",
        "a_full", "b_trunc", "pc-langid")
    },
    Some(s"""WITH sc AS (
      |  SELECT doc_id, lang,
      |    $wsSql AS t1,
      |    string_split_regex(trim(substr(text, 1, 50)), '\\s+') AS t2
      |  FROM documents),
      |pred AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(t1, t -> t IN ('der','und','die','nicht'))) AS a_de,
      |    len(list_filter(t1, t -> t IN ('the','a','and','of'))) AS a_en,
      |    len(list_filter(t1, t -> t IN ('el','la','de','que'))) AS a_es,
      |    len(list_filter(t1, t -> t IN ('le','et','les','une'))) AS a_fr,
      |    len(list_filter(t2, t -> t IN ('der','und','die','nicht'))) AS b_de,
      |    len(list_filter(t2, t -> t IN ('the','a','and','of'))) AS b_en,
      |    len(list_filter(t2, t -> t IN ('el','la','de','que'))) AS b_es,
      |    len(list_filter(t2, t -> t IN ('le','et','les','une'))) AS b_fr
      |  FROM sc),
      |dd AS (
      |  SELECT doc_id,
      |    (CASE WHEN (CASE
      |        WHEN a_de = greatest(a_de, a_en, a_es, a_fr) AND a_de > 0 THEN 'de'
      |        WHEN a_en = greatest(a_de, a_en, a_es, a_fr) AND a_en > 0 THEN 'en'
      |        WHEN a_es = greatest(a_de, a_en, a_es, a_fr) AND a_es > 0 THEN 'es'
      |        WHEN a_fr = greatest(a_de, a_en, a_es, a_fr) AND a_fr > 0 THEN 'fr'
      |        ELSE 'und' END) = lang THEN 1 ELSE 0 END)
      |    - (CASE WHEN (CASE
      |        WHEN b_de = greatest(b_de, b_en, b_es, b_fr) AND b_de > 0 THEN 'de'
      |        WHEN b_en = greatest(b_de, b_en, b_es, b_fr) AND b_en > 0 THEN 'en'
      |        WHEN b_es = greatest(b_de, b_en, b_es, b_fr) AND b_es > 0 THEN 'es'
      |        WHEN b_fr = greatest(b_de, b_en, b_es, b_fr) AND b_fr > 0 THEN 'fr'
      |        ELSE 'und' END) = lang THEN 1 ELSE 0 END) AS dv
      |  FROM pred),
      |rs AS (SELECT CAST(r AS BIGINT) AS r FROM range(32) t(r)),
      |w AS (
      |  SELECT dd.dv, rs.r,
      |    (CAST(('0x' || substr(md5('pc-langid' || CAST(dd.doc_id AS VARCHAR)
      |      || ':' || CAST(rs.r AS VARCHAR)), 1, 13)) AS BIGINT) + 0.5)
      |      / 4503599627370496.0 AS u
      |  FROM dd CROSS JOIN rs),
      |pw AS (
      |  SELECT r, dv,
      |    CASE WHEN u < 0.3678794411714423 THEN 0
      |         WHEN u < 0.7357588823428846 THEN 1
      |         WHEN u < 0.9196986029286058 THEN 2
      |         WHEN u < 0.9810118431238462 THEN 3
      |         WHEN u < 0.9963401531726563 THEN 4
      |         WHEN u < 0.9994058151824183 THEN 5
      |         ELSE 6 END AS wgt
      |  FROM w),
      |e AS (
      |  SELECT r, CAST(CAST(SUM(wgt * dv) AS BIGINT) AS DOUBLE)
      |    / CAST(CAST(SUM(wgt) AS BIGINT) AS DOUBLE) AS est
      |  FROM pw GROUP BY r HAVING SUM(wgt) > 0),
      |rk AS (SELECT est, ROW_NUMBER() OVER (ORDER BY est) AS rn FROM e),
      |ci AS (
      |  SELECT
      |    ROUND(MAX(CASE WHEN rn = 1 THEN est END) * 0.225
      |        + MAX(CASE WHEN rn = 2 THEN est END) * 0.775, 4) AS ci_lo,
      |    ROUND(MAX(CASE WHEN rn = 31 THEN est END) * 0.775
      |        + MAX(CASE WHEN rn = 32 THEN est END) * 0.225, 4) AS ci_hi,
      |    CAST(SUM(CASE WHEN est > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_win,
      |    CAST(COUNT(*) AS BIGINT) AS n_resamples
      |  FROM rk),
      |p AS (
      |  SELECT ROUND(CAST(SUM(dv) AS DOUBLE) / COUNT(*), 4) AS point_delta,
      |    CAST(COUNT(*) AS BIGINT) AS n_units
      |  FROM dd)
      |SELECT p.point_delta, p.n_units, ci.ci_lo, ci.ci_hi, ci.n_win,
      |  ci.n_resamples
      |FROM p, ci""".stripMargin))

  /** Group-conditional split conformal prediction (Mondrian, per
    * language): a fixed chars-per-token point predictor
    * (ŷ = 6·ws_tokens for n_chars) is wrapped with the ⌈(n+1)(1−α)⌉-th
    * smallest calibration |residual| per lang (α = 1/10, md5 cal/test
    * split), then audited for empirical coverage on the test rows —
    * the distribution-free interval discipline a curation pipeline
    * runs before trusting a scorer's point estimates. The conformal
    * rank is INTEGER arithmetic (no IEEE ceil edge); q̂ is an order
    * statistic (value well-defined under ties), so the oracle replays
    * the split, ranks and coverage exactly. ConformalSpec pins the
    * ≥ 1−α coverage guarantee and the small-group NULL-q̂ convention. */
  val q258 = GQuery(
    "q258_conformal_intervals",
    (s, d) => {
      val docs = documents(s, d)
        .withColumn("yhat", (size(wsTokens(col("text"))) * 6).cast("double"))
      graft.stats.Conformal.splitConformal(
        docs, "lang", col("n_chars"), col("yhat"),
        isCalib = graft.operators.Sampling.hashUnit(col("doc_id"), "conf") < 0.5,
        alphaNum = 1, alphaDen = 10)
    },
    Some(s"""WITH base AS (
      |  SELECT lang,
      |    abs(CAST(n_chars AS DOUBLE) - CAST(6 * len($wsSql) AS DOUBLE)) AS r,
      |    (CAST(('0x' || substr(md5('conf-' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
      |      / 268435456.0 < 0.5) AS cal
      |  FROM documents),
      |nc AS (
      |  SELECT lang, COUNT(*) AS n_cal,
      |    ((COUNT(*) + 1) * 9 + 9) // 10 AS k
      |  FROM base WHERE cal GROUP BY 1),
      |rk AS (
      |  SELECT lang, r, row_number() OVER (PARTITION BY lang ORDER BY r) AS rn
      |  FROM base WHERE cal),
      |q AS (
      |  SELECT nc.lang, nc.n_cal, rk.r AS qhat
      |  FROM nc LEFT JOIN rk ON rk.lang = nc.lang AND rk.rn = nc.k),
      |t AS (
      |  SELECT b.lang, COUNT(*) AS n_test,
      |    SUM(CASE WHEN q.qhat IS NULL OR b.r <= q.qhat THEN 1 ELSE 0 END) AS ncov
      |  FROM base b JOIN q ON b.lang = q.lang WHERE NOT b.cal GROUP BY 1)
      |SELECT q.lang, q.n_cal, t.n_test, round(q.qhat, 6) AS qhat,
      |  round(CAST(t.ncov AS DOUBLE) / t.n_test, 6) AS coverage
      |FROM q JOIN t ON q.lang = t.lang""".stripMargin))

  /** Fixed BPE merge table for q262 (rank order; [[graft.text.Bpe
    * .requireChainable]]-valid: 'th' is produced by rank 1 before rank
    * 2 consumes it, every other side is a single char). Fixed model
    * constants are the q200-clfW convention — training itself is
    * q130's surface. */
  private val bpeMerges = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r",
    "a" -> "n", "o" -> "n", "r" -> "e", "a" -> "t")

  /** BPE ENCODE over the corpus ([[graft.text.Bpe.applyMergesCol]]) —
    * tokenizer INFERENCE, the production counterpart of q130's
    * training census: every `[a-z]+` word becomes boundary-delimited
    * symbols and the 8-merge table applies as a chain of literal
    * string replaces (codegen'd built-ins, no UDF — the chained pass
    * is EXACTLY priority BPE under the chainability precondition, see
    * applyMergesCol). Per-language census: words, character symbols
    * before merging, tokens after, and the chars-per-token compression
    * the tokenizer buys. The identical replace chain runs in DuckDB,
    * so every token count sits under the hash. */
  val q262 = GQuery(
    "q262_bpe_encode",
    (s, d) => {
      // native one-pass kernel; bit-identical to the replace-chain
      // spelling (BpeSpec parity + this oracle replays the chain),
      // ~8x less string churn at sf1 (8.5 s → ~1 s)
      graft.functions.BpeEncode.register(s)
      val enc = documents(s, d)
        .withColumn("c", call_function("bpe_counts", col("text"),
          typedlit(bpeMerges.map(_._1)), typedlit(bpeMerges.map(_._2))))
      enc.groupBy(col("lang"))
        .agg(lcount(lit(1)).as("n_docs"),
          sum(col("c.n_words")).as("n_words"),
          sum(col("c.n_chars")).as("n_chars"),
          sum(col("c.n_tokens")).as("n_tokens"))
        .withColumn("chars_per_token",
          round(col("n_chars").cast("double") /
            call_function("nullif", col("n_tokens"), lit(0L)), 6))
    },
    Some {
      val chain = bpeMerges.foldLeft(
        "array_to_string(list_transform(regexp_extract_all(text, '[a-z]+'), " +
          "w -> regexp_replace(w, '(.)', '|\\1|', 'g')), ' ')") {
        case (acc, (a, b)) => s"replace($acc, '|$a||$b|', '|$a$b|')"
      }
      s"""WITH enc AS (
        |  SELECT lang,
        |    $chain AS s,
        |    len(regexp_extract_all(text, '[a-z]+')) AS n_w
        |  FROM documents),
        |per AS (
        |  SELECT lang, n_w,
        |    (len(s) - len(replace(s, '|', ''))) // 2 AS n_tok,
        |    len(regexp_replace(s, '[| ]', '', 'g')) AS n_chr
        |  FROM enc)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_w) AS BIGINT) AS n_words,
        |  CAST(SUM(n_chr) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  round(CAST(SUM(n_chr) AS DOUBLE) / NULLIF(SUM(n_tok), 0), 6) AS chars_per_token
        |FROM per GROUP BY lang""".stripMargin
    })

  /** ROUGE-L (Lin 2004) against per-language exemplar references —
    * the in-order-overlap eval beside the contiguous-match family
    * (q103 token overlap, q123 winnowed spans): every 11th document
    * scores its first-32-token LCS against its language's exemplar
    * (min doc_id), F1 = 2·LCS/(|cand|+|ref|). The LCS kernel is the
    * native [[graft.functions.LcsLen]] (two-row DP, cost capped by the
    * 32-token truncation — map-shaped at any corpus size; reference
    * side broadcasts). An O(n·m) DP is not SQL-replayable cell by
    * cell, so the oracle pins per-pair LCS lengths computed by the
    * INDEPENDENT `tools/lcs_oracle.py` CPython implementation — the
    * q179-zlib discipline; lengths and F1 replay in SQL around them. */
  val q264 = GQuery(
    "q264_rouge_eval",
    (s, d) => {
      graft.functions.LcsLen.register(s)
      val docs = documents(s, d)
        .withColumn("toks", slice(
          call_function("regexp_extract_all", col("text"), lit("[a-z]+"), lit(0)),
          1, 32))
      val ex = docs.groupBy(col("lang")).agg(min(col("doc_id")).as("__eid"))
      val refs = ex
        .join(docs.select(col("doc_id").as("__eid"), col("toks").as("ref_toks")),
          Seq("__eid"))
        .select(col("lang"), col("ref_toks"))
      docs.filter(col("doc_id") % 11 === 0)
        .join(broadcast(refs), Seq("lang"))
        .withColumn("lcs", call_function("lcs_len", col("toks"), col("ref_toks")))
        .withColumn("n_cand", size(col("toks")).cast("long"))
        .withColumn("n_ref", size(col("ref_toks")).cast("long"))
        .select(col("doc_id"), col("lang"), col("lcs").cast("long").as("lcs"),
          col("n_cand"), col("n_ref"),
          round(when(col("n_cand") + col("n_ref") === 0, lit(0.0))
            .otherwise((col("lcs") * 2).cast("double") /
              (col("n_cand") + col("n_ref"))), 6).as("rouge_l_f1"))
    },
    Some("""WITH lv(doc_id, lcs) AS (VALUES
      |(0,32),(11,6),(22,7),(33,8),(44,6),(55,5),(66,7),(77,7),(88,5),(99,9),
      |(110,5),(121,6),(132,7),(143,6),(154,6),(165,7),(176,7),(187,9),(198,6),
      |(209,6),(220,8),(231,6),(242,6),(253,8),(264,6),(275,4),(286,9),(297,8),
      |(308,5),(319,9),(330,6),(341,8),(352,6),(363,7),(374,10),(385,6),(396,7),
      |(407,6),(418,8),(429,7),(440,7),(451,3),(462,6),(473,7),(484,8),(495,7)),
      |tok AS (
      |  SELECT doc_id, lang, regexp_extract_all(text, '[a-z]+')[:32] AS toks
      |  FROM documents),
      |ex AS (SELECT lang, MIN(doc_id) AS eid FROM documents GROUP BY lang),
      |refs AS (
      |  SELECT t.lang, len(t.toks) AS n_ref
      |  FROM ex JOIN tok t ON t.doc_id = ex.eid)
      |SELECT t.doc_id, t.lang, CAST(lv.lcs AS BIGINT) AS lcs,
      |  CAST(len(t.toks) AS BIGINT) AS n_cand, CAST(r.n_ref AS BIGINT) AS n_ref,
      |  round(CASE WHEN len(t.toks) + r.n_ref = 0 THEN 0.0
      |    ELSE CAST(2 * lv.lcs AS DOUBLE) / (len(t.toks) + r.n_ref) END, 6)
      |    AS rouge_l_f1
      |FROM tok t JOIN refs r ON t.lang = r.lang
      |JOIN lv ON lv.doc_id = t.doc_id
      |WHERE t.doc_id % 11 = 0""".stripMargin))

  /** Corpus BLEU-4 components (Papineni 2002) against per-language
    * exemplar references — the n-gram-precision eval beside q264's
    * in-order ROUGE-L: every 11th doc scores its first-32-token
    * 1..4-gram CLIPPED matches against its language's exemplar (min
    * doc_id). Per language: matched/total per order, geometric-mean
    * precision via `sqrt(sqrt(((p1·p2)·p3)·p4))` (IEEE sqrt and
    * multiply are exactly rounded, so the composite is bit-identical
    * in any IEEE engine — the q243 ¾-power discipline; `exp(1−r/c)`
    * is NOT exactly rounded, so the brevity penalty is reported as
    * the exact ratio c/r instead of folded in). Scale shape: clipped
    * counting is one groupBy over candidate-side grams (bounded by
    * the 32-token truncation) joined to a BROADCAST reference-gram
    * table (5 langs × ≤32 grams × 4 orders) — map-shaped at any
    * corpus size; no shuffle touches full documents. */
  val q265 = GQuery(
    "q265_bleu_eval",
    (s, d) => {
      val docs = documents(s, d)
        .withColumn("toks", slice(
          call_function("regexp_extract_all", col("text"), lit("[a-z]+"), lit(0)),
          1, 32))
      val ex = docs.groupBy(col("lang")).agg(min(col("doc_id")).as("__eid"))
      val refs = ex
        .join(docs.select(col("doc_id").as("__eid"), col("toks").as("rtoks")),
          Seq("__eid"))
        .select(col("lang"), col("rtoks"))
      val cand = docs.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"), col("lang"), col("toks"))
      def gramStructs(toksCol: org.apache.spark.sql.Column) = array(
        (1 to 4).map(n => struct(lit(n).as("n"),
          call_function("word_ngrams", toksCol, lit(n), lit(false)).as("gs"))): _*)
      val cg = cand
        .select(col("doc_id"), col("lang"), explode(gramStructs(col("toks"))).as("x"))
        .select(col("doc_id"), col("lang"), col("x.n").as("n"), explode(col("x.gs")).as("g"))
        .groupBy(col("doc_id"), col("lang"), col("n"), col("g"))
        .agg(lcount(lit(1)).as("c"))
      val rg = refs
        .select(col("lang"), explode(gramStructs(col("rtoks"))).as("x"))
        .select(col("lang"), col("x.n").as("n"), explode(col("x.gs")).as("g"))
        .groupBy(col("lang"), col("n"), col("g"))
        .agg(lcount(lit(1)).as("rc"))
      val m = cg.join(broadcast(rg), Seq("lang", "n", "g"))
        .groupBy(col("lang"), col("n"))
        .agg(sum(least(col("c"), col("rc"))).as("m"))
        .groupBy(col("lang"))
        .agg(coalesce(sum(when(col("n") === 1, col("m"))), lit(0L)).as("m1"),
          coalesce(sum(when(col("n") === 2, col("m"))), lit(0L)).as("m2"),
          coalesce(sum(when(col("n") === 3, col("m"))), lit(0L)).as("m3"),
          coalesce(sum(when(col("n") === 4, col("m"))), lit(0L)).as("m4"))
      val tot = cand.select(col("lang"), size(col("toks")).cast("long").as("len"))
        .groupBy(col("lang"))
        .agg(lcount(lit(1)).as("n_docs"),
          sum(col("len")).as("t1"),
          sum(greatest(col("len") - 1, lit(0L))).as("t2"),
          sum(greatest(col("len") - 2, lit(0L))).as("t3"),
          sum(greatest(col("len") - 3, lit(0L))).as("t4"))
      val rlen = refs.select(col("lang"), size(col("rtoks")).cast("long").as("ref_len"))
      tot.join(m, Seq("lang"), "left")
        .join(broadcast(rlen), Seq("lang"))
        .select(col("lang"), col("n_docs"),
          coalesce(col("m1"), lit(0L)).as("m1"), col("t1"),
          coalesce(col("m2"), lit(0L)).as("m2"), col("t2"),
          coalesce(col("m3"), lit(0L)).as("m3"), col("t3"),
          coalesce(col("m4"), lit(0L)).as("m4"), col("t4"), col("ref_len"))
        .withColumn("bleu_nobp",
          when(col("t1") > 0 && col("t2") > 0 && col("t3") > 0 && col("t4") > 0,
            round(sqrt(sqrt(
              col("m1").cast("double") / col("t1").cast("double") *
                (col("m2").cast("double") / col("t2").cast("double")) *
                (col("m3").cast("double") / col("t3").cast("double")) *
                (col("m4").cast("double") / col("t4").cast("double")))), 6)))
        .withColumn("brevity_ratio",
          round(col("t1").cast("double") /
            (col("n_docs") * col("ref_len")).cast("double"), 6))
    },
    Some("""WITH tok AS (
      |  SELECT doc_id, lang, regexp_extract_all(text, '[a-z]+')[:32] AS toks
      |  FROM documents),
      |ex AS (SELECT lang, MIN(doc_id) AS eid FROM documents GROUP BY lang),
      |ref AS (SELECT t.lang, t.toks AS rtoks FROM ex JOIN tok t ON t.doc_id = ex.eid),
      |cand AS (SELECT doc_id, lang, toks FROM tok WHERE doc_id % 11 = 0),
      |ns AS (SELECT UNNEST([1, 2, 3, 4]) AS n),
      |cg AS (
      |  SELECT c.doc_id, c.lang, ns.n,
      |    array_to_string(c.toks[i:i+ns.n-1], ' ') AS g, COUNT(*) AS c
      |  FROM cand c, ns,
      |    UNNEST(generate_series(1, greatest(len(c.toks) - ns.n + 1, 0))) AS u(i)
      |  GROUP BY 1, 2, 3, 4),
      |rg AS (
      |  SELECT r.lang, ns.n, array_to_string(r.rtoks[i:i+ns.n-1], ' ') AS g,
      |    COUNT(*) AS rc
      |  FROM ref r, ns,
      |    UNNEST(generate_series(1, greatest(len(r.rtoks) - ns.n + 1, 0))) AS u(i)
      |  GROUP BY 1, 2, 3),
      |clip AS (
      |  SELECT cg.lang, cg.n, SUM(LEAST(cg.c, rg.rc)) AS m
      |  FROM cg JOIN rg ON cg.lang = rg.lang AND cg.n = rg.n AND cg.g = rg.g
      |  GROUP BY 1, 2),
      |mm AS (
      |  SELECT lang,
      |    COALESCE(SUM(CASE WHEN n = 1 THEN m END), 0) AS m1,
      |    COALESCE(SUM(CASE WHEN n = 2 THEN m END), 0) AS m2,
      |    COALESCE(SUM(CASE WHEN n = 3 THEN m END), 0) AS m3,
      |    COALESCE(SUM(CASE WHEN n = 4 THEN m END), 0) AS m4
      |  FROM clip GROUP BY lang),
      |tot AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(len(toks)) AS BIGINT) AS t1,
      |    CAST(SUM(greatest(len(toks) - 1, 0)) AS BIGINT) AS t2,
      |    CAST(SUM(greatest(len(toks) - 2, 0)) AS BIGINT) AS t3,
      |    CAST(SUM(greatest(len(toks) - 3, 0)) AS BIGINT) AS t4
      |  FROM cand GROUP BY lang),
      |rl AS (SELECT lang, CAST(len(rtoks) AS BIGINT) AS ref_len FROM ref)
      |SELECT t.lang, t.n_docs,
      |  CAST(COALESCE(mm.m1, 0) AS BIGINT) AS m1, t.t1,
      |  CAST(COALESCE(mm.m2, 0) AS BIGINT) AS m2, t.t2,
      |  CAST(COALESCE(mm.m3, 0) AS BIGINT) AS m3, t.t3,
      |  CAST(COALESCE(mm.m4, 0) AS BIGINT) AS m4, t.t4, rl.ref_len,
      |  CASE WHEN t.t1 > 0 AND t.t2 > 0 AND t.t3 > 0 AND t.t4 > 0 THEN
      |    round(sqrt(sqrt(
      |      CAST(COALESCE(mm.m1, 0) AS DOUBLE) / CAST(t.t1 AS DOUBLE) *
      |        (CAST(COALESCE(mm.m2, 0) AS DOUBLE) / CAST(t.t2 AS DOUBLE)) *
      |        (CAST(COALESCE(mm.m3, 0) AS DOUBLE) / CAST(t.t3 AS DOUBLE)) *
      |        (CAST(COALESCE(mm.m4, 0) AS DOUBLE) / CAST(t.t4 AS DOUBLE)))), 6)
      |  END AS bleu_nobp,
      |  round(CAST(t.t1 AS DOUBLE) / CAST(t.n_docs * rl.ref_len AS DOUBLE), 6)
      |    AS brevity_ratio
      |FROM tot t
      |LEFT JOIN mm ON mm.lang = t.lang
      |JOIN rl ON rl.lang = t.lang""".stripMargin))

  /** PMI collocation mining: top-8 adjacent bigrams per language by
    * pointwise mutual information — the phrase-detection pass word2vec
    * / phrase-aware tokenizers run before training (Mikolov 2013 §4).
    * PMI's log is monotone, so ranking needs only the RATIO
    * c_ab·N/(c_a·c_b), kept exact as a floor-scaled integer in
    * DECIMAL(38,0) (int64 would wrap: c_ab·N·10⁶ passes 2⁶³ once the
    * corpus passes ~10⁹ tokens; decimal holds to 10³⁸). Min support
    * c_ab ≥ 5 kills the singleton-pair noise PMI is notorious for.
    * Scale shape: one gram shuffle for counts, bigrams join unigram
    * counts on (lang, word) — hash-partitioned, candidate-bounded —
    * and the 5-row totals frame broadcasts; top-8 rides the
    * TopKPerKey strategy (bounded heaps, no global sort). */
  /** (q266/q273 shared) per-lang unigram and adjacent-bigram count
    * tables over a doc subset. */
  private def pmiCounts(df: org.apache.spark.sql.DataFrame) = {
    val t = df.select(col("lang"),
      call_function("regexp_extract_all", col("text"), lit("[a-z]+"), lit(0)).as("ws"))
    val uni = t.select(col("lang"), explode(col("ws")).as("w"))
      .groupBy(col("lang"), col("w")).agg(lcount(lit(1)).as("cu"))
    val big = t.select(col("lang"),
        explode(call_function("word_ngrams", col("ws"), lit(2), lit(false))).as("g"))
      .groupBy(col("lang"), col("g")).agg(lcount(lit(1)).as("pair_n"))
    (uni, big)
  }

  /** (q266/q273 shared) PMI scoring + top-8 per lang over count
    * tables (min support 5 applied HERE, after any merge). */
  private def pmiTop8(uni: org.apache.spark.sql.DataFrame,
                      big: org.apache.spark.sql.DataFrame) = {
    val ntok = uni.groupBy(col("lang")).agg(sum(col("cu")).as("ntok"))
    val scored = big.filter(col("pair_n") >= 5)
      .withColumn("wa", substring_index(col("g"), " ", 1))
      .withColumn("wb", substring_index(col("g"), " ", -1))
      .join(uni.select(col("lang"), col("w").as("wa"), col("cu").as("ca")),
        Seq("lang", "wa"))
      .join(uni.select(col("lang"), col("w").as("wb"), col("cu").as("cb")),
        Seq("lang", "wb"))
      .join(broadcast(ntok), Seq("lang"))
      .withColumn("score_e6", expr(
        "CAST((CAST(pair_n AS DECIMAL(38,0)) * ntok * 1000000) div " +
          "(CAST(ca AS DECIMAL(38,0)) * cb) AS BIGINT)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("score_e6").desc, col("g"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 8)
      .select(col("lang"), col("rn"), col("g").as("gram"),
        col("pair_n"), col("score_e6"))
  }

  val q266 = GQuery(
    "q266_pmi_collocations",
    (s, d) => {
      val (uni, big) = pmiCounts(documents(s, d))
      pmiTop8(uni, big)
    },
    Some(pmiOracleSql))

  /** Full-corpus PMI rebuild — the oracle for BOTH q266 (which builds
    * it directly) and q273 (which builds it by MERGING landed + batch
    * count tables; hash-matching this rebuild proves the additive
    * merge law end-to-end, the q227/q228 rollup discipline). */
  private lazy val pmiOracleSql =
    """WITH t AS (
      |  SELECT lang, regexp_extract_all(text, '[a-z]+') AS ws FROM documents),
      |uni AS (
      |  SELECT lang, ws[i] AS w, COUNT(*) AS cu
      |  FROM t, UNNEST(generate_series(1, len(ws))) AS u(i)
      |  GROUP BY 1, 2),
      |ntok AS (SELECT lang, CAST(SUM(cu) AS BIGINT) AS ntok FROM uni GROUP BY 1),
      |big AS (
      |  SELECT lang, ws[i] || ' ' || ws[i+1] AS g, COUNT(*) AS pair_n
      |  FROM t, UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      |sc AS (
      |  SELECT b.lang, b.g AS gram, b.pair_n,
      |    CAST((CAST(b.pair_n AS HUGEINT) * n.ntok * 1000000)
      |      // (CAST(ua.cu AS HUGEINT) * ub.cu) AS BIGINT) AS score_e6
      |  FROM big b
      |  JOIN uni ua ON ua.lang = b.lang AND ua.w = string_split(b.g, ' ')[1]
      |  JOIN uni ub ON ub.lang = b.lang AND ub.w = string_split(b.g, ' ')[2]
      |  JOIN ntok n ON n.lang = b.lang),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
      |    ORDER BY score_e6 DESC, gram) AS rn FROM sc)
      |SELECT lang, CAST(rn AS BIGINT) AS rn, gram, pair_n, score_e6
      |FROM r WHERE rn <= 8""".stripMargin

  /** q273: INCREMENTAL PMI maintenance — the landed-index arm of q266
    * (the q88/q229 discipline applied to collocation mining): the
    * landed corpus's unigram/bigram COUNT TABLES are the persisted
    * index (at production an ArtifactStore parquet; additive counts
    * are what make the index maintainable), a new batch (doc_id % 3 =
    * 0) tokenizes ONLY ITSELF, and the merge is a unionByName + sum —
    * counts are additive, so merged-index scoring ≡ full rebuild. The
    * oracle IS the full rebuild (q266's SQL verbatim): hash-matching
    * it proves the merge law end-to-end, not just a projection. */
  val q273 = GQuery(
    "q273_incremental_pmi",
    (s, d) => {
      val docs = documents(s, d)
      val (landedUni, landedBig) = pmiCounts(docs.filter(col("doc_id") % 3 =!= 0))
      val (batchUni, batchBig) = pmiCounts(docs.filter(col("doc_id") % 3 === 0))
      val uni = landedUni.unionByName(batchUni)
        .groupBy(col("lang"), col("w")).agg(sum(col("cu")).as("cu"))
      val big = landedBig.unionByName(batchBig)
        .groupBy(col("lang"), col("g")).agg(sum(col("pair_n")).as("pair_n"))
      pmiTop8(uni, big)
    },
    Some(pmiOracleSql))

  /** q271: Benjamini–Hochberg FDR gate over per-language significance
    * tests ([[graft.stats.Fdr]]) — q244's paired Poisson-bootstrap
    * (full-text vs truncated langid accuracy) re-run PER LANGUAGE, its
    * two-sided sign surrogate p = 2·min(n_win, R−n_win)/R kept as an
    * exact ratio, and the step-up rule applied with integer
    * cross-multiplication at α = 1/4. The multiple-testing discipline
    * a segment-sliced eval needs: at 5 languages one test is expected
    * to look significant at α=0.2 by chance alone. Everything under
    * the hash gate is integer (weights, sign counts, the rejection
    * set); the only double is the sort key, an exactly-rounded IEEE
    * quotient. */
  val q271 = GQuery(
    "q271_fdr_bh",
    (s, d) => {
      val docs = documents(s, d)
      val base = docs.select(col("lang"), col("doc_id"),
        ((predictLang(wsTokens(col("text"))) === col("lang")).cast("long") -
          (predictLang(wsTokens(substring(col("text"), 1, 50)))
            === col("lang")).cast("long")).as("dv"))
      val est = base
        .withColumn("r", explode(array((0 until 32).map(lit): _*)))
        .withColumn("w", graft.stats.Bootstrap.poissonWeight(
          concat(col("doc_id").cast("string"), lit(":"), col("r")), "fdr-langid"))
        .groupBy(col("lang"), col("r"))
        .agg(sum(col("w") * col("dv")).as("ws"), sum(col("w")).as("wn"))
        .filter(col("wn") > 0)
      val nw = est.groupBy(col("lang"))
        .agg(sum(when(col("ws") > 0, lit(1L)).otherwise(lit(0L))).as("n_win"),
          lcount(lit(1)).as("n_r"))
        .withColumn("p_num",
          lit(2L) * least(col("n_win"), col("n_r") - col("n_win")))
      graft.stats.Fdr.benjaminiHochberg(nw, Seq("lang"),
          col("p_num"), col("n_r"), alphaNum = 1, alphaDen = 4)
        .select(col("lang"), col("n_win"), col("n_r"), col("p_num"),
          col("rank"), col("rejected"))
    },
    Some(s"""WITH sc AS (
      |  SELECT doc_id, lang,
      |    $wsSql AS t1,
      |    string_split_regex(trim(substr(text, 1, 50)), '\\s+') AS t2
      |  FROM documents),
      |pred AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(t1, t -> t IN ('der','und','die','nicht'))) AS a_de,
      |    len(list_filter(t1, t -> t IN ('the','a','and','of'))) AS a_en,
      |    len(list_filter(t1, t -> t IN ('el','la','de','que'))) AS a_es,
      |    len(list_filter(t1, t -> t IN ('le','et','les','une'))) AS a_fr,
      |    len(list_filter(t2, t -> t IN ('der','und','die','nicht'))) AS b_de,
      |    len(list_filter(t2, t -> t IN ('the','a','and','of'))) AS b_en,
      |    len(list_filter(t2, t -> t IN ('el','la','de','que'))) AS b_es,
      |    len(list_filter(t2, t -> t IN ('le','et','les','une'))) AS b_fr
      |  FROM sc),
      |dd AS (
      |  SELECT doc_id, lang,
      |    (CASE WHEN (CASE
      |        WHEN a_de = greatest(a_de, a_en, a_es, a_fr) AND a_de > 0 THEN 'de'
      |        WHEN a_en = greatest(a_de, a_en, a_es, a_fr) AND a_en > 0 THEN 'en'
      |        WHEN a_es = greatest(a_de, a_en, a_es, a_fr) AND a_es > 0 THEN 'es'
      |        WHEN a_fr = greatest(a_de, a_en, a_es, a_fr) AND a_fr > 0 THEN 'fr'
      |        ELSE 'und' END) = lang THEN 1 ELSE 0 END)
      |    - (CASE WHEN (CASE
      |        WHEN b_de = greatest(b_de, b_en, b_es, b_fr) AND b_de > 0 THEN 'de'
      |        WHEN b_en = greatest(b_de, b_en, b_es, b_fr) AND b_en > 0 THEN 'en'
      |        WHEN b_es = greatest(b_de, b_en, b_es, b_fr) AND b_es > 0 THEN 'es'
      |        WHEN b_fr = greatest(b_de, b_en, b_es, b_fr) AND b_fr > 0 THEN 'fr'
      |        ELSE 'und' END) = lang THEN 1 ELSE 0 END) AS dv
      |  FROM pred),
      |rs AS (SELECT CAST(r AS BIGINT) AS r FROM range(32) t(r)),
      |w AS (
      |  SELECT dd.lang, dd.dv, rs.r,
      |    (CAST(('0x' || substr(md5('fdr-langid' || CAST(dd.doc_id AS VARCHAR)
      |      || ':' || CAST(rs.r AS VARCHAR)), 1, 13)) AS BIGINT) + 0.5)
      |      / 4503599627370496.0 AS u
      |  FROM dd CROSS JOIN rs),
      |pw AS (
      |  SELECT lang, r, dv,
      |    CASE WHEN u < 0.3678794411714423 THEN 0
      |         WHEN u < 0.7357588823428846 THEN 1
      |         WHEN u < 0.9196986029286058 THEN 2
      |         WHEN u < 0.9810118431238462 THEN 3
      |         WHEN u < 0.9963401531726563 THEN 4
      |         WHEN u < 0.9994058151824183 THEN 5
      |         ELSE 6 END AS wgt
      |  FROM w),
      |e AS (
      |  SELECT lang, r, CAST(SUM(wgt * dv) AS BIGINT) AS ws
      |  FROM pw GROUP BY lang, r HAVING SUM(wgt) > 0),
      |nw AS (
      |  SELECT lang,
      |    CAST(SUM(CASE WHEN ws > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_win,
      |    CAST(COUNT(*) AS BIGINT) AS n_r
      |  FROM e GROUP BY lang),
      |pp AS (
      |  SELECT lang, n_win, n_r,
      |    CAST(2 * LEAST(n_win, n_r - n_win) AS BIGINT) AS p_num
      |  FROM nw),
      |rk AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    ORDER BY CAST(p_num AS DOUBLE) / CAST(n_r AS DOUBLE), lang) AS rank
      |  FROM pp),
      |ks AS (
      |  SELECT MAX(CASE WHEN p_num * (SELECT COUNT(*) FROM rk) * 4
      |    <= rank * 1 * n_r THEN rank END) AS kstar FROM rk)
      |SELECT rk.lang, rk.n_win, rk.n_r, rk.p_num,
      |  CAST(rk.rank AS BIGINT) AS rank,
      |  rk.rank <= COALESCE(ks.kstar, 0) AS rejected
      |FROM rk, ks""".stripMargin))

  /** q292: chrF character n-gram F-score (Popović 2015) — the
    * tokenization-free MT/generation eval beside q265's word-level BLEU
    * and q264's ROUGE-L: clipped character 1..6-gram matches between
    * candidates and the per-language exemplar reference, then per-n
    * F2 = 5·P·R/(4P+R). Counts (m, t_cand, t_ref) are exact integers
    * under the hash; F2 is one fixed-order IEEE formula over them,
    * rounded 6 on both engines. Same scale shape as BLEU: candidate
    * grams fold map-side to (lang, n, gram) counts, the ≤6·200-gram
    * reference census broadcasts. */
  val q292 = GQuery(
    "q292_chrf_eval",
    (s, d) => {
      val docs = documents(s, d)
        .withColumn("ch", substring(
          regexp_replace(col("text"), "[^a-z]", ""), 1, 200))
      val ex = docs.groupBy(col("lang")).agg(min(col("doc_id")).as("__eid"))
      val refs = ex
        .join(docs.select(col("doc_id").as("__eid"), col("ch").as("rch")),
          Seq("__eid"))
        .select(col("lang"), col("rch"))
      val cand = docs.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"), col("lang"), col("ch"))
      // Spark sequence(1, 0) DESCENDS ([1, 0]) instead of returning
      // empty — guard short/empty strings explicitly (DuckDB's
      // range(1, 1) is already empty)
      def grams(name: String) = array((1 to 6).map(n =>
        struct(lit(n).as("n"),
          expr(s"CASE WHEN length($name) >= $n THEN " +
            s"transform(sequence(1, length($name) - ${n - 1}), " +
            s"i -> substring($name, i, $n)) " +
            "ELSE CAST(array() AS ARRAY<STRING>) END").as("gs"))): _*)
      val cg = cand
        .select(col("doc_id"), col("lang"), explode(grams("ch")).as("x"))
        .select(col("doc_id"), col("lang"), col("x.n").as("n"),
          explode(col("x.gs")).as("g"))
        .groupBy(col("doc_id"), col("lang"), col("n"), col("g"))
        .agg(lcount(lit(1)).as("c"))
      val rg = refs
        .select(col("lang"), explode(grams("rch")).as("x"))
        .select(col("lang"), col("x.n").as("n"), explode(col("x.gs")).as("g"))
        .groupBy(col("lang"), col("n"), col("g"))
        .agg(lcount(lit(1)).as("rc"))
        .localCheckpoint(eager = false) // match join + t_ref census
      val m = cg.join(broadcast(rg), Seq("lang", "n", "g"))
        .groupBy(col("lang"), col("n"))
        .agg(sum(least(col("c"), col("rc"))).as("m"))
      val tc = cand
        .select(col("lang"), explode(grams("ch")).as("x"))
        .select(col("lang"), col("x.n").as("n"),
          size(col("x.gs")).cast("long").as("k"))
        .groupBy(col("lang"), col("n"))
        .agg(sum(col("k")).as("t_cand"), lcount(lit(1)).as("n_docs"))
      // corpus aggregation is per (candidate, reference) PAIR: every
      // candidate doc is scored against the lang exemplar, so the
      // recall denominator is n_docs x the reference's gram count
      val tr = rg.groupBy(col("lang"), col("n")).agg(sum(col("rc")).as("r1"))
      tc.join(m, Seq("lang", "n"), "left")
        .join(broadcast(tr), Seq("lang", "n"))
        .select(col("lang"), col("n"),
          coalesce(col("m"), lit(0L)).as("m"), col("t_cand"),
          (col("r1") * col("n_docs")).as("t_ref"))
        .withColumn("chrf2", expr(
          """CASE WHEN t_cand > 0 AND t_ref > 0
            |  AND (4.0 * (CAST(m AS DOUBLE) / CAST(t_cand AS DOUBLE))
            |       + (CAST(m AS DOUBLE) / CAST(t_ref AS DOUBLE))) > 0
            |THEN round(
            |  5.0 * (CAST(m AS DOUBLE) / CAST(t_cand AS DOUBLE))
            |      * (CAST(m AS DOUBLE) / CAST(t_ref AS DOUBLE))
            |  / (4.0 * (CAST(m AS DOUBLE) / CAST(t_cand AS DOUBLE))
            |     + (CAST(m AS DOUBLE) / CAST(t_ref AS DOUBLE))), 6)
            |ELSE 0.0 END""".stripMargin))
        .orderBy(col("lang"), col("n"))
    },
    Some("""WITH docs AS (
      |  SELECT doc_id, lang,
      |    substr(regexp_replace(text, '[^a-z]', '', 'g'), 1, 200) AS ch
      |  FROM documents),
      |ex AS (SELECT lang, MIN(doc_id) AS eid FROM docs GROUP BY lang),
      |refs AS (
      |  SELECT e.lang, d.ch AS rch FROM ex e JOIN docs d ON d.doc_id = e.eid),
      |cand AS (SELECT doc_id, lang, ch FROM docs WHERE doc_id % 11 = 0),
      |cg AS (
      |  SELECT doc_id, lang, n, g, COUNT(*) AS c FROM (
      |    SELECT doc_id, lang, n.n,
      |      unnest(list_transform(range(1, greatest(length(ch) - n.n + 1, 0) + 1),
      |        i -> substr(ch, CAST(i AS INT), CAST(n.n AS INT)))) AS g
      |    FROM cand, (SELECT unnest(range(1, 7)) AS n) n)
      |  GROUP BY 1, 2, 3, 4),
      |rg AS MATERIALIZED (
      |  SELECT lang, n, g, COUNT(*) AS rc FROM (
      |    SELECT lang, n.n,
      |      unnest(list_transform(range(1, greatest(length(rch) - n.n + 1, 0) + 1),
      |        i -> substr(rch, CAST(i AS INT), CAST(n.n AS INT)))) AS g
      |    FROM refs, (SELECT unnest(range(1, 7)) AS n) n)
      |  GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT cg.lang, cg.n, CAST(SUM(LEAST(cg.c, rg.rc)) AS BIGINT) AS m
      |  FROM cg JOIN rg ON cg.lang = rg.lang AND cg.n = rg.n AND cg.g = rg.g
      |  GROUP BY 1, 2),
      |tc AS (
      |  SELECT lang, n.n,
      |    CAST(SUM(greatest(length(ch) - n.n + 1, 0)) AS BIGINT) AS t_cand,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM cand, (SELECT unnest(range(1, 7)) AS n) n GROUP BY 1, 2),
      |tr AS (
      |  SELECT lang, n, CAST(SUM(rc) AS BIGINT) AS r1 FROM rg GROUP BY 1, 2)
      |SELECT tc.lang, CAST(tc.n AS BIGINT) AS n, COALESCE(m.m, 0) AS m,
      |  tc.t_cand, tr.r1 * tc.n_docs AS t_ref,
      |  CASE WHEN tc.t_cand > 0 AND tr.r1 * tc.n_docs > 0
      |    AND (4.0 * (CAST(COALESCE(m.m, 0) AS DOUBLE) / CAST(tc.t_cand AS DOUBLE))
      |         + (CAST(COALESCE(m.m, 0) AS DOUBLE) / CAST(tr.r1 * tc.n_docs AS DOUBLE))) > 0
      |  THEN round(
      |    5.0 * (CAST(COALESCE(m.m, 0) AS DOUBLE) / CAST(tc.t_cand AS DOUBLE))
      |        * (CAST(COALESCE(m.m, 0) AS DOUBLE) / CAST(tr.r1 * tc.n_docs AS DOUBLE))
      |    / (4.0 * (CAST(COALESCE(m.m, 0) AS DOUBLE) / CAST(tc.t_cand AS DOUBLE))
      |       + (CAST(COALESCE(m.m, 0) AS DOUBLE) / CAST(tr.r1 * tc.n_docs AS DOUBLE))), 6)
      |  ELSE 0.0 END AS chrf2
      |FROM tc LEFT JOIN m ON tc.lang = m.lang AND tc.n = m.n
      |JOIN tr ON tc.lang = tr.lang AND tc.n = tr.n
      |ORDER BY tc.lang, tc.n""".stripMargin))

  /** q346: speculative-decoding acceptance census (Leviathan et al.
    * 2023) — the serving-economics signal a deployment reads before
    * pairing a draft model with a target: per context word w the
    * acceptance probability is α(w) = Σᵥ min(p_draft(v|w),
    * p_target(v|w)), and the expected tokens per γ = 4 draft round is
    * (1 − ᾱ⁵)/(1 − ᾱ). Draft = the doc_id % 3 = 0 corpus slice
    * (bigram MLE), target = the full corpus — the draft's bigrams are
    * a SUBSET of the target's, so one conditional-count frame with
    * both counts carries the whole min() exactly (a pair the draft
    * never saw contributes min = 0 and needs no row). ᾱ is the
    * target-context-mass-weighted mean over contexts the draft knows;
    * the unknown-context mass is reported as coverage. Sums are
    * DECIMAL(38,6)-routed; ᾱ⁵ is spelled as four multiplications
    * (pow() is not correctly-rounded everywhere). Two token passes,
    * everything else vocabulary²-bounded. */
  val q346 = GQuery(
    "q346_speculative_accept",
    (s, d) => {
      import graft.text.{LangModel, TextFunctions}
      val docs = documents(s, d)
      val bg = docs.select(col("lang"), col("doc_id"),
          explode(TextFunctions.ngrams(TextFunctions.wsTokens(col("text")), 2))
            .as("bgp"))
        .select(col("lang"), col("doc_id"),
          substring_index(col("bgp"), " ", 1).as("w1"),
          substring_index(col("bgp"), " ", -1).as("w2"))
      val pair = bg.groupBy(col("lang"), col("w1"), col("w2"))
        .agg(lcount(lit(1)).as("c_t"),
          coalesce(sum(when(col("doc_id") % 3 === 0, 1L)), lit(0L)).as("c_d"))
      val ctx = pair.groupBy(col("lang"), col("w1"))
        .agg(sum(col("c_t")).as("n_t"), sum(col("c_d")).as("n_d"))
      val aw = pair.join(ctx, Seq("lang", "w1"))
        .filter(col("n_d") > 0)
        .select(col("lang"), col("w1"), col("n_t"), col("n_d"),
          least(col("c_d").cast("double") / col("n_d").cast("double"),
            col("c_t").cast("double") / col("n_t").cast("double")).as("m"))
        .groupBy(col("lang"), col("w1"), col("n_t"))
        .agg(dsum(col("m")).as("a_w"))
      val tot = ctx.groupBy(col("lang"))
        .agg(sum(col("n_t")).as("mass_all"),
          coalesce(sum(when(col("n_d") > 0, col("n_t"))), lit(0L))
            .as("mass_shared"))
      aw.groupBy(col("lang"))
        .agg(lcount(lit(1)).as("n_ctx_shared"),
          dsum(col("n_t").cast("double") * col("a_w")).as("wsum"))
        .join(tot, Seq("lang"))
        .withColumn("alpha", col("wsum") / col("mass_shared").cast("double"))
        .select(col("lang"), col("n_ctx_shared"),
          expr("(mass_shared * 1000000) div mass_all").as("coverage_ppm"),
          round(col("alpha"), 6).as("alpha"),
          round(when(col("alpha") < 1.0,
            (lit(1.0) - col("alpha") * col("alpha") * col("alpha")
              * col("alpha") * col("alpha")) / (lit(1.0) - col("alpha")))
            .otherwise(lit(5.0)), 6).as("exp_accepted"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH bg AS (
      |  SELECT lang, doc_id, ws[i] AS w1, ws[i+1] AS w2
      |  FROM (SELECT lang, doc_id, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)),
      |pair AS (
      |  SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c_t,
      |    COALESCE(CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 END) AS BIGINT),
      |      0) AS c_d
      |  FROM bg GROUP BY lang, w1, w2),
      |ctx AS (
      |  SELECT lang, w1, CAST(SUM(c_t) AS BIGINT) AS n_t,
      |    CAST(SUM(c_d) AS BIGINT) AS n_d
      |  FROM pair GROUP BY lang, w1),
      |aw AS (
      |  SELECT p.lang, p.w1, c.n_t,
      |    CAST(SUM(CAST(LEAST(CAST(p.c_d AS DOUBLE) / CAST(c.n_d AS DOUBLE),
      |      CAST(p.c_t AS DOUBLE) / CAST(c.n_t AS DOUBLE))
      |      AS DECIMAL(38,6))) AS DOUBLE) AS a_w
      |  FROM pair p JOIN ctx c ON p.lang = c.lang AND p.w1 = c.w1
      |  WHERE c.n_d > 0
      |  GROUP BY p.lang, p.w1, c.n_t),
      |tot AS (
      |  SELECT lang, CAST(SUM(n_t) AS BIGINT) AS mass_all,
      |    COALESCE(CAST(SUM(CASE WHEN n_d > 0 THEN n_t END) AS BIGINT), 0)
      |      AS mass_shared
      |  FROM ctx GROUP BY lang),
      |agg AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_ctx_shared,
      |    CAST(SUM(CAST(CAST(n_t AS DOUBLE) * a_w AS DECIMAL(38,6)))
      |      AS DOUBLE) AS wsum
      |  FROM aw GROUP BY lang)
      |SELECT a.lang, a.n_ctx_shared,
      |  (t.mass_shared * 1000000) // t.mass_all AS coverage_ppm,
      |  round(a.wsum / CAST(t.mass_shared AS DOUBLE), 6) AS alpha,
      |  round(CASE WHEN a.wsum / CAST(t.mass_shared AS DOUBLE) < 1.0 THEN
      |    (1.0 - (a.wsum / CAST(t.mass_shared AS DOUBLE))
      |         * (a.wsum / CAST(t.mass_shared AS DOUBLE))
      |         * (a.wsum / CAST(t.mass_shared AS DOUBLE))
      |         * (a.wsum / CAST(t.mass_shared AS DOUBLE))
      |         * (a.wsum / CAST(t.mass_shared AS DOUBLE)))
      |    / (1.0 - a.wsum / CAST(t.mass_shared AS DOUBLE))
      |    ELSE 5.0 END, 6) AS exp_accepted
      |FROM agg a JOIN tot t ON a.lang = t.lang ORDER BY a.lang""".stripMargin))

  /** q347: prefix-sharing census ([[graft.text.PrefixSharing]]) — the
    * prompt-/KV-cache planning signal beside q346's acceptance rates:
    * how many characters of each document's 200-char head could a
    * prefix cache reuse from SOME other document? In lexicographic
    * order the all-pairs max LCP is attained at a sorted neighbor
    * (prefix order is compatible with string order), so one global
    * sort + the two-pass segmented neighbor scan answers it — never
    * an all-pairs join. Census per source: head chars vs reusable
    * chars and the cache-hit ppm. The oracle replays the sort, the
    * adjacent-pair LCPs (substr-equality max), and the two-sided
    * max. */
  val q347 = GQuery(
    "q347_prefix_sharing",
    (s, d) => {
      import graft.text.PrefixSharing
      val docs = documents(s, d)
        .select(col("doc_id"), col("source"),
          substring(col("text"), 1, 200).as("k"))
      val re = PrefixSharing.reusablePrefix(docs, "doc_id", "k")
      docs.join(re.select(col("id").as("doc_id"), col("reusable")),
          Seq("doc_id"))
        .groupBy(col("source"))
        .agg(lcount(lit(1)).as("n_docs"),
          sum(length(col("k")).cast("long")).as("head_chars"),
          sum(col("reusable")).as("reusable_chars"))
        .withColumn("hit_ppm",
          expr("(reusable_chars * 1000000) div head_chars"))
        .orderBy(col("source"))
    },
    Some("""WITH k AS (
      |  SELECT doc_id, source, substr(text, 1, 200) AS k FROM documents),
      |ord AS (
      |  SELECT doc_id, source, k,
      |    row_number() OVER (ORDER BY k, doc_id) - 1 AS idx
      |  FROM k),
      |pl AS (
      |  SELECT a.idx AS hi_idx,
      |    MAX(CASE WHEN substr(a.k, 1, t.i) = substr(b.k, 1, t.i)
      |      THEN t.i ELSE 0 END) AS l
      |  FROM ord a JOIN ord b ON b.idx = a.idx - 1,
      |    UNNEST(generate_series(1,
      |      GREATEST(LEAST(length(a.k), length(b.k)), 1))) AS t(i)
      |  GROUP BY a.idx),
      |re AS (
      |  SELECT o.doc_id, o.source, CAST(length(o.k) AS BIGINT) AS ch,
      |    GREATEST(COALESCE(p1.l, 0), COALESCE(p2.l, 0)) AS reusable
      |  FROM ord o
      |  LEFT JOIN pl p1 ON p1.hi_idx = o.idx
      |  LEFT JOIN pl p2 ON p2.hi_idx = o.idx + 1)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(ch) AS BIGINT) AS head_chars,
      |  CAST(SUM(reusable) AS BIGINT) AS reusable_chars,
      |  (CAST(SUM(reusable) AS BIGINT) * 1000000)
      |    // CAST(SUM(ch) AS BIGINT) AS hit_ppm
      |FROM re GROUP BY source ORDER BY source""".stripMargin))

  /** q371: IBM Model 1 lexical translation probabilities, 2 unrolled
    * EM iterations (Brown et al. 1993) — the word-alignment operator
    * under every classical bitext pipeline (and the statistical
    * complement of q131's embedding-space mutual-NN mining): bitext is
    * a deterministic fixture (source = first 8 whitespace tokens of
    * each en document, target = the same tokens 'x'-prefixed), so EM
    * must RECOVER the diagonal alignment from co-occurrence alone.
    * Uniform init makes iteration 1's fractional count just
    * 1/(sentence source length) — no t-table join needed; iteration 2
    * joins the learned t(f|e) back onto the in-sentence pair frame,
    * normalizes per (sentence, f) — the E step — and re-estimates per
    * (e, f) — the M step. Pair work is (sentence length)² ≤ 64 per
    * doc, count sums decimal-routed, and the published census is the
    * top-20 source words by mass with their argmax translation. */
  val q371 = GQuery(
    "q371_ibm_model1",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
      val sent = documents(s, d).filter(col("lang") === "en")
        .select(col("doc_id"), slice(wsTokens(col("text")), 1, 8).as("es"))
        .select(col("doc_id"), col("es"), size(col("es")).as("ne"))
      val pairs = sent
        .select(col("doc_id"), col("ne"), explode(col("es")).as("e"), col("es"))
        .select(col("doc_id"), col("ne"), col("e"),
          explode(transform(col("es"), t => concat(lit("x"), t))).as("f"))
        // the in-sentence pair frame feeds BOTH EM iterations and the
        // mass ranking — land it once (sf1 measured 35.7 s -> the
        // double-explode chain re-derived 3x per plan)
        .localCheckpoint(eager = false)
      // iteration 1: uniform t cancels in the E-step ratio, so the
      // fractional count is 1/ne per in-sentence pair occurrence
      val c1 = pairs.groupBy(col("e"), col("f"))
        .agg(dsum(lit(1.0) / col("ne")).as("c"))
      val t1 = c1.withColumn("tot",
          sum(col("c").cast(graft.core.Exact.Dec)).over(
            w.partitionBy(col("e"))).cast("double"))
        .select(col("e"), col("f"), (col("c") / col("tot")).as("t"))
      // iteration 2: E (normalize per sentence-target), M (re-count)
      val e2 = pairs.join(t1, Seq("e", "f"))
        .withColumn("den",
          sum(col("t").cast(graft.core.Exact.Dec)).over(
            w.partitionBy(col("doc_id"), col("f"))).cast("double"))
        .withColumn("delta", col("t") / col("den"))
      val c2 = e2.groupBy(col("e"), col("f")).agg(dsum(col("delta")).as("c"))
      val t2 = c2.withColumn("tot",
          sum(col("c").cast(graft.core.Exact.Dec)).over(
            w.partitionBy(col("e"))).cast("double"))
        .select(col("e"), col("f"), (col("c") / col("tot")).as("t"))
      val topE = pairs.groupBy(col("e")).agg(lcount(lit(1)).as("mass"))
        .orderBy(col("mass").desc, col("e").asc).limit(20)
      t2.join(broadcast(topE), Seq("e"))
        .withColumn("rn", row_number().over(
          w.partitionBy(col("e")).orderBy(col("t").desc, col("f").asc)))
        .filter(col("rn") === 1)
        .select(col("e"), col("mass"), col("f").as("best_f"),
          round(col("t"), 6).as("t_best"))
        .orderBy(col("mass").desc, col("e").asc)
    },
    Some(s"""WITH sent AS (
      |  SELECT doc_id, ($wsSql)[1:8] AS es
      |  FROM documents WHERE lang = 'en'),
      |pairs AS (
      |  SELECT s.doc_id, len(s.es) AS ne, ue.e, 'x' || uf.f AS f
      |  FROM sent s, UNNEST(s.es) AS ue(e), UNNEST(s.es) AS uf(f)),
      |c1 AS (
      |  SELECT e, f, ${sqlDsum("CAST(1 AS DOUBLE) / ne")} AS c
      |  FROM pairs GROUP BY e, f),
      |t1 AS (
      |  SELECT e, f, c / CAST(SUM(CAST(c AS DECIMAL(38,6)))
      |    OVER (PARTITION BY e) AS DOUBLE) AS t
      |  FROM c1),
      |e2 AS (
      |  SELECT p.doc_id, p.e, p.f, t1.t,
      |    t1.t / CAST(SUM(CAST(t1.t AS DECIMAL(38,6)))
      |      OVER (PARTITION BY p.doc_id, p.f ROWS BETWEEN UNBOUNDED
      |        PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS delta
      |  FROM pairs p JOIN t1 ON p.e = t1.e AND p.f = t1.f),
      |c2 AS (
      |  SELECT e, f, ${sqlDsum("delta")} AS c FROM e2 GROUP BY e, f),
      |t2 AS (
      |  SELECT e, f, c / CAST(SUM(CAST(c AS DECIMAL(38,6)))
      |    OVER (PARTITION BY e) AS DOUBLE) AS t
      |  FROM c2),
      |tope AS (
      |  SELECT e, CAST(COUNT(*) AS BIGINT) AS mass
      |  FROM pairs GROUP BY e
      |  ORDER BY mass DESC, e ASC LIMIT 20),
      |best AS (
      |  SELECT t2.e, tope.mass, t2.f, t2.t,
      |    row_number() OVER (PARTITION BY t2.e
      |      ORDER BY t2.t DESC, t2.f ASC) AS rn
      |  FROM t2 JOIN tope ON t2.e = tope.e)
      |SELECT e, mass, f AS best_f, round(t, 6) AS t_best
      |FROM best WHERE rn = 1
      |ORDER BY mass DESC, e ASC""".stripMargin))

  /** q385: PPMI power iteration — the count-based embedding recipe
    * (Levy & Goldberg 2014: word2vec ≈ PPMI matrix factorization),
    * here as the top singular direction of the truncated PPMI
    * co-occurrence matrix: vocabulary truncates to the top-200 words
    * (bounded heap — the standard cut), PPMI(w1,w2) =
    * max(0, ln(c12·N/(c1·c2))) over adjacent-token pairs, then 3
    * unrolled normalize-multiply power steps on the 200²-bounded
    * sparse frame (iteration cost independent of corpus size; the
    * corpus is scanned once to count). Published: the top-10 loading
    * words and the Rayleigh quotient — the "how much structure does
    * dimension 1 carry" number. */
  val q385 = GQuery(
    "q385_ppmi_power_iteration",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val toks = documents(s, d)
        .select(col("doc_id"), wsTokens(col("text")).as("ws"))
      val uni = toks.select(explode(col("ws")).as("w"))
        .groupBy(col("w")).agg(lcount(lit(1)).as("c"))
      val vocab = uni.orderBy(col("c").desc, col("w").asc).limit(200)
        .localCheckpoint(eager = false)
      val pairs = toks
        .select(explode(graft.text.TextFunctions.ngrams(col("ws"), 2))
          .as("bg"))
        .select(substring_index(col("bg"), " ", 1).as("w1"),
          substring_index(col("bg"), " ", -1).as("w2"))
        .join(broadcast(vocab.select(col("w").as("w1"))), Seq("w1"))
        .join(broadcast(vocab.select(col("w").as("w2"))), Seq("w2"))
        .groupBy(col("w1"), col("w2")).agg(lcount(lit(1)).as("c12"))
      val nTot = pairs.agg(sum(col("c12")).as("nn"))
      val c1 = pairs.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      val c2 = pairs.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
      val m = pairs.join(c1, Seq("w1")).join(c2, Seq("w2"))
        .crossJoin(broadcast(nTot))
        .select(col("w1"), col("w2"),
          greatest(log(col("c12").cast("double") * col("nn")
            / (col("c1").cast("double") * col("c2"))), lit(0.0)).as("m"))
        .filter(col("m") > 0)
        .localCheckpoint(eager = false)
      val v0 = m.select(col("w2").as("w")).distinct()
        .withColumn("v", lit(1.0))
      def step(v: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame = {
        val nrm = v.agg(sqrt(dsum(col("v") * col("v"))).as("nrm"))
        val vn = v.crossJoin(broadcast(nrm))
          .select(col("w"), (col("v") / col("nrm")).as("v"))
        m.join(vn.select(col("w").as("w2"), col("v")), Seq("w2"))
          .groupBy(col("w1").as("w"))
          .agg(dsum(col("m") * col("v")).as("v"))
      }
      val v3 = step(step(step(v0))).localCheckpoint(eager = false)
      val nrm3 = v3.agg(sqrt(dsum(col("v") * col("v"))).as("nrm"))
      val vfin = v3.crossJoin(broadcast(nrm3))
        .select(col("w"), (col("v") / col("nrm")).as("v"))
      // Rayleigh quotient under the final normalized vector
      val mv = m.join(vfin.select(col("w").as("w2"), col("v")), Seq("w2"))
        .groupBy(col("w1").as("w")).agg(dsum(col("m") * col("v")).as("mv"))
      val ray = vfin.join(mv, Seq("w"))
        .agg(dsum(col("v") * col("mv")).as("rayleigh"))
      vfin.crossJoin(broadcast(ray))
        .withColumn("rn", row_number().over(
          W.orderBy(abs(col("v")).desc, col("w").asc)))
        .filter(col("rn") <= 10)
        .select(col("rn").cast("long").as("rank"), col("w"),
          round(col("v"), 6).as("loading"),
          round(col("rayleigh"), 6).as("rayleigh"))
        .orderBy(col("rank"))
    },
    Some {
      def stepCte(prev: String, out: String) =
        s"""n$out AS (
      |  SELECT sqrt(${sqlDsum("v * v")}) AS nrm FROM $prev),
      |v$out AS (
      |  SELECT w, v / (SELECT nrm FROM n$out) AS v FROM $prev),
      |$out AS (
      |  SELECT m.w1 AS w, ${sqlDsum("m.m * q.v")} AS v
      |  FROM m JOIN v$out q ON m.w2 = q.w
      |  GROUP BY m.w1)"""
      s"""WITH toks AS (
      |  SELECT doc_id, $wsSql AS ws FROM documents),
      |uni AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w),
      |vocab AS (
      |  SELECT w FROM uni ORDER BY c DESC, w ASC LIMIT 200),
      |bg AS (
      |  SELECT ws[i] AS w1, ws[i+1] AS w2
      |  FROM toks,
      |    UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)),
      |pairs AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      |  FROM bg
      |  WHERE w1 IN (SELECT w FROM vocab) AND w2 IN (SELECT w FROM vocab)
      |  GROUP BY w1, w2),
      |nt AS (SELECT CAST(SUM(c12) AS BIGINT) AS nn FROM pairs),
      |cc1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
      |  FROM pairs GROUP BY w1),
      |cc2 AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2
      |  FROM pairs GROUP BY w2),
      |m AS (
      |  SELECT p.w1, p.w2,
      |    GREATEST(ln(CAST(p.c12 AS DOUBLE) * nt.nn
      |      / (CAST(a.c1 AS DOUBLE) * b.c2)), 0.0) AS m
      |  FROM pairs p JOIN cc1 a ON p.w1 = a.w1
      |  JOIN cc2 b ON p.w2 = b.w2 CROSS JOIN nt
      |  WHERE GREATEST(ln(CAST(p.c12 AS DOUBLE) * nt.nn
      |      / (CAST(a.c1 AS DOUBLE) * b.c2)), 0.0) > 0),
      |p0 AS (
      |  SELECT DISTINCT w2 AS w, CAST(1.0 AS DOUBLE) AS v FROM m),
      |${stepCte("p0", "p1")},
      |${stepCte("p1", "p2")},
      |${stepCte("p2", "p3")},
      |nf AS (SELECT sqrt(${sqlDsum("v * v")}) AS nrm FROM p3),
      |vf AS (SELECT w, v / (SELECT nrm FROM nf) AS v FROM p3),
      |mv AS (
      |  SELECT m.w1 AS w, ${sqlDsum("m.m * q.v")} AS mv
      |  FROM m JOIN vf q ON m.w2 = q.w GROUP BY m.w1),
      |ray AS (
      |  SELECT ${sqlDsum("vf.v * mv.mv")} AS rayleigh
      |  FROM vf JOIN mv ON vf.w = mv.w),
      |rk AS (
      |  SELECT vf.w, vf.v, row_number() OVER (ORDER BY abs(vf.v) DESC,
      |    vf.w ASC) AS rn
      |  FROM vf)
      |SELECT CAST(rn AS BIGINT) AS rank, w, round(v, 6) AS loading,
      |  round((SELECT rayleigh FROM ray), 6) AS rayleigh
      |FROM rk WHERE rn <= 10 ORDER BY rank""".stripMargin
    })

  /** q391: PLSA topic model, 2 topics × 2 unrolled EM steps (Hofmann
    * 1999 — the count-based ancestor of LDA, and the canonical
    * "distributed EM over doc-word counts" workload): responsibilities
    * r_z(d,w) = θ_dz·φ_zw/Σ computed WIDE (both topics as columns —
    * no explode), M-step re-estimates φ by word and θ by doc — two
    * grouped shuffles per step, the real topic-model dataflow.
    * High-entropy sigmoid/ln inits keep every product off the decimal
    * cast boundaries (the q372 lesson); the doc-word count frame
    * lands once (it feeds every step twice). Published: top-10 words
    * per topic with φ and the corpus topic masses. */
  val q391 = GQuery(
    "q391_plsa_topics",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val counts = documents(s, d)
        .select(col("doc_id").as("doc"),
          explode(wsTokens(col("text"))).as("w"))
        .groupBy(col("doc"), col("w")).agg(lcount(lit(1)).as("n"))
        .localCheckpoint(eager = false)
      val nd = counts.groupBy(col("doc")).agg(sum(col("n")).as("nd"))
      val theta0 = nd.select(col("doc"), col("nd"),
        (lit(1.0) / (lit(1.0)
          + exp(lit(0.0) - ((col("doc") % 21) - 10).cast("double") / 5)))
          .as("t0"))
      val phiU = counts.select(col("w")).distinct()
        .select(col("w"),
          (lit(1.0) + log(lit(2.0) + (length(col("w")) % 13)) / 10).as("u0"),
          (lit(1.0) + log(lit(2.0) + ((length(col("w")) * 2) % 13)) / 10)
            .as("u1"))
      val phiZ = phiU.agg(dsum(col("u0")).as("z0"), dsum(col("u1")).as("z1"))
      val phi0 = phiU.crossJoin(broadcast(phiZ))
        .select(col("w"), (col("u0") / col("z0")).as("f0"),
          (col("u1") / col("z1")).as("f1"))
      def em(theta: org.apache.spark.sql.DataFrame,
             phi: org.apache.spark.sql.DataFrame) = {
        // r12: θ has one row per DOCUMENT — broadcasting it (r11) was a
        // local-mode assumption that hits Spark's 8 GB broadcast cap at
        // scale. Instead the responsibility frame `j` (consumed twice
        // per EM step: φ-numerator and θ-numerator) is itself pinned,
        // so the compute-once win survives without the broadcast: one
        // equi-join on doc (AQE picks broadcast when θ is actually
        // small, shuffle when it is not) + the vocab-bounded broadcast
        // of φ, evaluated once, read twice (guide §2.4/§3.1). Projected
        // to the four columns the consumers need before the pin (§2.3).
        val j = counts.join(theta, Seq("doc"))
          .join(broadcast(phi), Seq("w"))
          .withColumn("a0", col("t0") * col("f0"))
          .withColumn("a1", (lit(1.0) - col("t0")) * col("f1"))
          .select(col("doc"), col("w"), col("n"), col("nd"),
            (col("a0") / (col("a0") + col("a1"))).as("r0"))
          .localCheckpoint(eager = false)
        val phiNum = j.groupBy(col("w"))
          .agg(dsum(col("n") * col("r0")).as("p0"),
            dsum(col("n") * (lit(1.0) - col("r0"))).as("p1"))
          .localCheckpoint(eager = false)
        val phiNorm = phiNum.agg(dsum(col("p0")).as("z0"),
          dsum(col("p1")).as("z1"))
        val phiN = phiNum.crossJoin(broadcast(phiNorm))
          .select(col("w"), (col("p0") / col("z0")).as("f0"),
            (col("p1") / col("z1")).as("f1"))
        val thetaN = j.groupBy(col("doc"), col("nd"))
          .agg(dsum(col("n") * col("r0")).as("s0"))
          .select(col("doc"), col("nd"),
            (col("s0") / col("nd")).as("t0"))
          .localCheckpoint(eager = false)
        (thetaN, phiN)
      }
      val (t1, f1) = em(theta0, phi0)
      val (t2, f2) = em(t1, f1)
      val mass = t2.agg((dsum(col("t0")) / count(lit(1))).as("mass0"),
        lcount(lit(1)).as("n_docs"))
      val ranked = f2
        .select(lit(0L).as("topic"), col("w"), col("f0").as("phi"))
        .unionByName(f2.select(lit(1L).as("topic"), col("w"),
          col("f1").as("phi")))
        .withColumn("rn", row_number().over(
          W.partitionBy(col("topic")).orderBy(col("phi").desc, col("w").asc)))
        .filter(col("rn") <= 10)
      ranked.crossJoin(broadcast(mass))
        .select(col("topic"), col("rn").cast("long").as("rank"), col("w"),
          round(col("phi"), 6).as("phi"),
          round(when(col("topic") === 0, col("mass0"))
            .otherwise(lit(1.0) - col("mass0")), 6).as("topic_mass"),
          col("n_docs"))
        .orderBy(col("topic"), col("rank"))
    },
    Some {
      def emCte(tp: String, fp: String, tn: String, fn: String, i: Int) =
        s"""j$i AS (
      |  SELECT c.doc, c.w, c.n, t.nd, t.t0, f.f0, f.f1,
      |    (t.t0 * f.f0) / ((t.t0 * f.f0) + ((1.0 - t.t0) * f.f1)) AS r0
      |  FROM counts c JOIN $tp t ON c.doc = t.doc
      |  JOIN $fp f ON c.w = f.w),
      |pn$i AS (
      |  SELECT w, ${sqlDsum("n * r0")} AS p0,
      |    ${sqlDsum("n * (1.0 - r0)")} AS p1
      |  FROM j$i GROUP BY w),
      |pz$i AS (
      |  SELECT ${sqlDsum("p0")} AS z0, ${sqlDsum("p1")} AS z1 FROM pn$i),
      |$fn AS (
      |  SELECT w, p0 / (SELECT z0 FROM pz$i) AS f0,
      |    p1 / (SELECT z1 FROM pz$i) AS f1
      |  FROM pn$i),
      |$tn AS (
      |  SELECT doc, nd, ${sqlDsum("n * r0")} / nd AS t0
      |  FROM j$i GROUP BY doc, nd)"""
      s"""WITH counts AS (
      |  SELECT doc_id AS doc, w, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM (SELECT doc_id, unnest($wsSql) AS w FROM documents)
      |  GROUP BY 1, 2),
      |nd AS (SELECT doc, CAST(SUM(n) AS BIGINT) AS nd
      |  FROM counts GROUP BY doc),
      |t0f AS (
      |  SELECT doc, nd,
      |    1.0 / (1.0 + exp(0.0 - CAST((doc % 21) - 10 AS DOUBLE) / 5))
      |      AS t0
      |  FROM nd),
      |pu AS (
      |  SELECT w, 1.0 + ln(2.0 + (length(w) % 13)) / 10 AS u0,
      |    1.0 + ln(2.0 + ((length(w) * 2) % 13)) / 10 AS u1
      |  FROM (SELECT DISTINCT w FROM counts)),
      |pz AS (SELECT ${sqlDsum("u0")} AS z0, ${sqlDsum("u1")} AS z1 FROM pu),
      |f0f AS (
      |  SELECT w, u0 / (SELECT z0 FROM pz) AS f0,
      |    u1 / (SELECT z1 FROM pz) AS f1
      |  FROM pu),
      |${emCte("t0f", "f0f", "t1f", "f1f", 1)},
      |${emCte("t1f", "f1f", "t2f", "f2f", 2)},
      |mass AS (
      |  SELECT ${sqlDsum("t0")} / COUNT(*) AS mass0,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM t2f),
      |ranked AS (
      |  SELECT topic, w, phi, row_number() OVER (PARTITION BY topic
      |    ORDER BY phi DESC, w ASC) AS rn
      |  FROM (SELECT CAST(0 AS BIGINT) AS topic, w, f0 AS phi FROM f2f
      |        UNION ALL
      |        SELECT CAST(1 AS BIGINT), w, f1 FROM f2f))
      |SELECT r.topic, CAST(r.rn AS BIGINT) AS rank, r.w,
      |  round(r.phi, 6) AS phi,
      |  round(CASE WHEN r.topic = 0 THEN m.mass0
      |    ELSE 1.0 - m.mass0 END, 6) AS topic_mass,
      |  m.n_docs
      |FROM ranked r CROSS JOIN mass m
      |WHERE r.rn <= 10 ORDER BY r.topic, r.rn""".stripMargin
    })

  /** q395: extractive summarization census (LexRank-lite — Erkan &
    * Radev 2004; the SENTENCE-graph sibling of q267's word-graph
    * TextRank): per document, sentences become nodes, edges are
    * distinct-token Jaccard similarities, and 3 unrolled damped
    * power steps rank centrality — all documents' graphs advance in
    * ONE frame per step (partitioned by doc; pair work is
    * sentences²-per-doc, never corpus²). Published per language:
    * sentence mass, the mean top-sentence score and an index
    * checksum of the selected summaries. */
  val q395 = GQuery(
    "q395_lexrank_summary",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val sents = documents(s, d)
        .select(col("doc_id").as("doc"), col("lang"),
          posexplode(regexp_extract_all(col("text"),
            lit("[^.!?]+[.!?]*"), lit(0))).as(Seq("i0", "sent")))
        .filter(length(trim(col("sent"))) > 0)
        .withColumn("idx", row_number().over(
          W.partitionBy(col("doc")).orderBy(col("i0"))))
        .select(col("doc"), col("lang"), col("idx"),
          array_distinct(split(trim(col("sent")), "\\s+")).as("toks"))
        .localCheckpoint(eager = false)
      val pairs = sents.select(col("doc"), col("idx").as("i"),
          col("toks").as("ta"))
        .join(sents.select(col("doc"), col("idx").as("j"),
          col("toks").as("tb")), Seq("doc"))
        .filter(col("i") =!= col("j"))
        .withColumn("inter", size(array_intersect(col("ta"), col("tb")))
          .cast("long"))
        .filter(col("inter") > 0)
        .select(col("doc"), col("i"), col("j"),
          (col("inter").cast("double")
            / (size(col("ta")) + size(col("tb")) - col("inter")))
            .as("w"))
        .localCheckpoint(eager = false)
      val rowTot = pairs.groupBy(col("doc"), col("j"))
        .agg(dsum(col("w")).as("wj"))
      val norm = pairs.join(rowTot, Seq("doc", "j"))
        .select(col("doc"), col("i"), col("j"), (col("w") / col("wj"))
          .as("t"))
      val ns = sents.groupBy(col("doc")).agg(lcount(lit(1)).as("ns"))
      val p0 = sents.select(col("doc"), col("idx"))
        .join(broadcast(ns), Seq("doc"))
        .select(col("doc"), col("idx"), (lit(1.0) / col("ns")).as("p"))
      val p3 = (1 to 3).foldLeft(p0) { (p, _) =>
        val contrib = norm.join(p.select(col("doc"), col("idx").as("j"),
            col("p")), Seq("doc", "j"))
          .groupBy(col("doc"), col("i").as("idx"))
          .agg(dsum(col("t") * col("p")).as("c"))
        sents.select(col("doc"), col("idx"))
          .join(broadcast(ns), Seq("doc"))
          .join(contrib, Seq("doc", "idx"), "left")
          .select(col("doc"), col("idx"),
            (lit(0.15) / col("ns")
              + lit(0.85) * coalesce(col("c"), lit(0.0))).as("p"))
      }
      val top = p3.withColumn("rn", row_number().over(
          W.partitionBy(col("doc")).orderBy(col("p").desc, col("idx").asc)))
        .filter(col("rn") === 1)
      sents.select(col("doc"), col("lang")).distinct()
        .join(top, Seq("doc"))
        .groupBy(col("lang"))
        .agg(lcount(lit(1)).as("n_docs"),
          (dsum(col("p")) / count(lit(1))).as("mp"),
          sum(col("idx")).cast("long").as("idx_checksum"))
        .join(sents.groupBy(col("lang")).agg(lcount(lit(1)).as("n_sents")),
          Seq("lang"))
        .select(col("lang"), col("n_docs"), col("n_sents"),
          round(col("mp"), 6).as("mean_top_score"), col("idx_checksum"))
        .orderBy(col("lang"))
    },
    Some {
      def step(prev: String, out: String) =
        s"""c$out AS (
      |  SELECT t.doc, t.i AS idx, ${sqlDsum("t.t * p.p")} AS c
      |  FROM norm t JOIN $prev p ON t.doc = p.doc AND t.j = p.idx
      |  GROUP BY t.doc, t.i),
      |$out AS (
      |  SELECT s.doc, s.idx,
      |    0.15 / ns.ns + 0.85 * COALESCE(c.c, 0.0) AS p
      |  FROM sidx s JOIN ns ON s.doc = ns.doc
      |  LEFT JOIN c$out c ON s.doc = c.doc AND s.idx = c.idx)"""
      s"""WITH sraw AS (
      |  SELECT doc_id AS doc, lang,
      |    regexp_extract_all(text, '[^.!?]+[.!?]*') AS arr
      |  FROM documents),
      |se AS (
      |  SELECT doc, lang, arr[i] AS sent, i AS i0
      |  FROM sraw, UNNEST(generate_series(1, len(arr))) u(i)
      |  WHERE length(trim(arr[i])) > 0),
      |sents AS (
      |  SELECT doc, lang,
      |    ROW_NUMBER() OVER (PARTITION BY doc ORDER BY i0) AS idx,
      |    list_distinct(${wsSql.replace("trim(text)", "trim(sent)")})
      |      AS toks
      |  FROM se),
      |sidx AS (SELECT doc, idx FROM sents),
      |pairs AS (
      |  SELECT a.doc, a.idx AS i, b.idx AS j,
      |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |      / (len(a.toks) + len(b.toks)
      |        - len(list_intersect(a.toks, b.toks))) AS w
      |  FROM sents a JOIN sents b ON a.doc = b.doc AND a.idx <> b.idx
      |  WHERE len(list_intersect(a.toks, b.toks)) > 0),
      |rt AS (SELECT doc, j, ${sqlDsum("w")} AS wj
      |  FROM pairs GROUP BY doc, j),
      |norm AS (
      |  SELECT p.doc, p.i, p.j, p.w / r.wj AS t
      |  FROM pairs p JOIN rt r ON p.doc = r.doc AND p.j = r.j),
      |ns AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS ns
      |  FROM sents GROUP BY doc),
      |pp0 AS (
      |  SELECT s.doc, s.idx, 1.0 / ns.ns AS p
      |  FROM sidx s JOIN ns ON s.doc = ns.doc),
      |${step("pp0", "pp1")},
      |${step("pp1", "pp2")},
      |${step("pp2", "pp3")},
      |top AS (
      |  SELECT doc, idx, p FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc
      |      ORDER BY p DESC, idx ASC) AS rn FROM pp3) WHERE rn = 1),
      |dl AS (SELECT DISTINCT doc, lang FROM sents),
      |sl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sents
      |  FROM sents GROUP BY lang)
      |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs, sl.n_sents,
      |  round(${sqlDsum("t.p")} / COUNT(*), 6) AS mean_top_score,
      |  CAST(SUM(t.idx) AS BIGINT) AS idx_checksum
      |FROM dl d JOIN top t ON d.doc = t.doc
      |JOIN sl ON d.lang = sl.lang
      |GROUP BY d.lang, sl.n_sents ORDER BY d.lang""".stripMargin
    })

  /** q403: quality-filter ablation — the "does the gate actually help"
    * EXPERIMENT the curation family (q139 Gopher, q140 C4) asserts by
    * proxy: train the add-one bigram LM on (a) the full train slice
    * and (b) only docs passing the Gopher stopword-density rule, then
    * compare mean held-out log-probability under both models. Like
    * q400 this runs the model TWICE — but training is a grouped
    * aggregation, so the ablation is two counting passes, not two
    * fits; per-doc scores e6-floor (q146 discipline) making the
    * corpus means exact integer ratios. */
  val q403 = GQuery(
    "q403_filter_ablation",
    (s, d) => {
      val docs = documents(s, d)
      val train = docs.filter(col("doc_id") % 3 =!= 0)
      val heldout = docs.filter(col("doc_id") % 3 === 0)
      // corpus-frequent-token density plays the stopword role (the
      // language-agnostic form of Gopher's stopword-density rule — the
      // synthetic corpus has no English stopwords to count). An
      // ABSOLUTE frequency threshold, not top-k: the sf1 scale-up
      // rotates text per replica, and a top-k cut there picks k
      // rotations of the same token, which no single document can
      // contain twice (measured: empty filtered slice -> 1/0)
      // r11: tokenize/bigram each slice ONCE and pin — the two LM
      // arms (full-train model, filtered-train model) plus the
      // frequent-token and qualifying passes otherwise run the regex
      // tokenizer ~6× and the 2-gram kernel 4× over the same text
      // (guide §1.2). The filtered model's counts are semi-joins on
      // the pinned frames, bit-identical to re-tokenizing the slice.
      val trTok = train
        .select(col("doc_id"), explode(wsTokens(col("text"))).as("w"))
        .localCheckpoint(eager = false)
      val trBg = graft.text.LangModel.bigramPairs(train, "doc_id", "text")
        .localCheckpoint(eager = false)
      val hoBg = graft.text.LangModel.bigramPairs(heldout, "doc_id", "text")
        .localCheckpoint(eager = false)
      val freqTok = trTok.select(col("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 50).select(col("w"))
      val qualifying = trTok
        .join(freqTok.withColumn("hit", lit(1L)), Seq("w"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("nt"),
          coalesce(sum(col("hit")), lit(0L)).as("nf"))
        .filter(col("nf") * 2 >= col("nt"))
        .select(col("doc_id"))
        .localCheckpoint(eager = false) // 3 consumers: nF + two semi-joins
      def modelFrom(toks: org.apache.spark.sql.DataFrame,
                    pairs: org.apache.spark.sql.DataFrame) =
        graft.text.LangModel.BigramModel(
          pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2")),
          toks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
            .withColumnRenamed("w", "w1"),
          toks.agg(countDistinct(col("w")).as("v")))
      def meanLp(model: graft.text.LangModel.BigramModel) =
        graft.text.LangModel.scorePairs(hoBg, model)
          .select(floor(col("logprob") * 1e6 + 0.5).cast("long").as("lp_e6"))
          .agg(lcount(lit(1)).as("n_ho"), sum(col("lp_e6")).as("slp"))
      val a = meanLp(modelFrom(trTok.select(col("w")), trBg))
      val b = meanLp(modelFrom(
        trTok.join(qualifying, Seq("doc_id"), "left_semi").select(col("w")),
        trBg.join(qualifying.withColumnRenamed("doc_id", "doc"),
          Seq("doc"), "left_semi")))
      val nA = train.agg(lcount(lit(1)).as("n_train_all"))
      // qualifying ⊆ train and is already per-doc distinct, so the
      // filtered-slice size is its row count (no third documents scan)
      val nF = qualifying.agg(lcount(lit(1)).as("n_train_filt"))
      nA.crossJoin(broadcast(nF))
        .crossJoin(broadcast(a.select(col("n_ho"), col("slp").as("slp_all"))))
        .crossJoin(broadcast(b.select(col("slp").as("slp_filt"))))
        .select(col("n_train_all"), col("n_train_filt"), col("n_ho"),
          round(col("slp_all").cast("double") / col("n_ho") / 1e6, 6)
            .as("mean_lp_all"),
          round(col("slp_filt").cast("double") / col("n_ho") / 1e6, 6)
            .as("mean_lp_filt"),
          round((col("slp_filt") - col("slp_all")).cast("double")
            / col("n_ho") / 1e6, 6).as("delta"))
    },
    Some {
      def lm(p: String, trainRel: String) =
        s"""${p}cbg AS (
      |  SELECT b.w1, b.w2, CAST(COUNT(*) AS BIGINT) AS c2
      |  FROM bg b JOIN $trainRel t ON b.doc = t.doc_id
      |  GROUP BY b.w1, b.w2),
      |${p}toks AS (
      |  SELECT unnest($wsSql) AS w FROM $trainRel),
      |${p}cuni AS (SELECT w AS w1, CAST(COUNT(*) AS BIGINT) AS c1
      |  FROM ${p}toks GROUP BY 1),
      |${p}voc AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
      |  FROM ${p}toks),
      |${p}sc AS (
      |  SELECT b.doc,
      |    CAST(floor((${graft.core.Exact.sqlLsumAt(
             s"ln(CAST(COALESCE(g.c2, 0) + 1 AS DOUBLE)" +
               s" / CAST(COALESCE(u.c1, 0) + ${p}voc.v AS DOUBLE))",
             "1000000000.0")} / COUNT(*)) * 1e6 + 0.5) AS BIGINT) AS lp_e6
      |  FROM bg b
      |  JOIN ho h ON b.doc = h.doc_id
      |  LEFT JOIN ${p}cbg g ON b.w1 = g.w1 AND b.w2 = g.w2
      |  LEFT JOIN ${p}cuni u ON b.w1 = u.w1
      |  CROSS JOIN ${p}voc
      |  GROUP BY b.doc),
      |${p}agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_ho,
      |    CAST(SUM(lp_e6) AS BIGINT) AS slp
      |  FROM ${p}sc)"""
      s"""WITH tr AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
      |ho AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
      |ftok AS (
      |  SELECT w FROM (
      |    SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      |    FROM (SELECT unnest($wsSql) AS w FROM tr) GROUP BY w)
      |  WHERE c >= 50),
      |qual AS (
      |  SELECT doc_id FROM (
      |    SELECT t.doc_id, u.w,
      |      CASE WHEN u.w IN (SELECT w FROM ftok) THEN 1 ELSE 0 END AS hit
      |    FROM (SELECT doc_id, $wsSql AS dws FROM tr) t,
      |      UNNEST(t.dws) AS u(w))
      |  GROUP BY doc_id
      |  HAVING CAST(SUM(hit) AS BIGINT) * 2 >= COUNT(*)),
      |trf AS (
      |  SELECT doc_id, text FROM tr
      |  WHERE doc_id IN (SELECT doc_id FROM qual)),
      |bg AS (
      |  SELECT doc_id AS doc, ws[i] AS w1, ws[i+1] AS w2
      |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)),
      |${lm("a1", "tr")},
      |${lm("f1", "trf")}
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tr) AS n_train_all,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM trf) AS n_train_filt,
      |  a.n_ho,
      |  round(CAST(a.slp AS DOUBLE) / a.n_ho / 1e6, 6) AS mean_lp_all,
      |  round(CAST(f.slp AS DOUBLE) / a.n_ho / 1e6, 6) AS mean_lp_filt,
      |  round(CAST(f.slp - a.slp AS DOUBLE) / a.n_ho / 1e6, 6) AS delta
      |FROM a1agg a CROSS JOIN f1agg f""".stripMargin
    })

  def queries: Seq[GQuery] =
    Seq(q32, q33, q34, q35, q66, q89, q91, q94, q96, q98, q99, q101,
      q106, q107, q109, q110, q111, q112, q115, q116, q120, q121, q126,
      q130, q132, q134, q135, q136, q137, q139, q140, q141, q179, q189, q193,
      q195, q200, q201, q236, q244, q258, q262, q264, q265, q266, q271,
      q273, q292, q346, q347, q371, q385, q391, q395, q403)
}
