package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Exact._
import graft.core.Tables._
import graft.stats.SortPercentile
import graft.text.LangModel

/** Corpus-distribution diagnostics: CCNet-style perplexity bucketing
  * and the Zipf rank-frequency fit — the statistical health checks a
  * corpus runs before mixing/weighting decisions. Both are exact
  * compositions of machinery that is already oracle-gated alone
  * (bigram LM q89, percentiles q23, OLS q25, vocabulary q101).
  */
object CorpusStatQueries {

  private val wsSql = "string_split_regex(trim(text), '\\s+')"

  /** q146: CCNet perplexity buckets (Wenzek et al. 2020) — every
    * document scored by mean add-one bigram log-probability under a
    * model counted from the doc_id % 3 ≠ 0 slice, then cut into
    * head / middle / tail terciles PER LANGUAGE at the exact type-7
    * 1/3 and 2/3 quantiles of the e6-floored score. The tercile
    * boundaries come from [[SortPercentile]] (two-pass exact, no
    * per-group buffering, no per-language single-reducer sort — the
    * ntile() spelling would serialize each language through one
    * task); bucket assignment is then a broadcast-back comparison, so
    * the scale path is one histogram pass + a map-only label. Census
    * per (lang, bucket) pins doc counts, bigram mass, and score range. */
  val q146 = GQuery(
    "q146_perplexity_buckets",
    (s, d) => {
      val docs = documents(s, d)
      val model = LangModel.train(docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
      val scored = LangModel.score(docs, model, "doc_id", "text")
        .withColumn("lp_e6", floor(col("logprob") * 1e6 + 0.5).cast("long"))
        .join(docs.select(col("doc_id").as("doc"), col("lang")), Seq("doc"))
      val cuts = SortPercentile.percentiles(scored, Seq("lang"),
        col("lp_e6").cast("double"), Seq(1.0 / 3.0, 2.0 / 3.0), Seq("t_lo", "t_hi"))
      scored.join(broadcast(cuts), Seq("lang"))
        .withColumn("bucket",
          when(col("lp_e6") >= col("t_hi"), "head")
            .when(col("lp_e6") >= col("t_lo"), "middle")
            .otherwise("tail"))
        .groupBy(col("lang"), col("bucket"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("n_bigrams"),
          min(col("lp_e6")).as("min_e6"),
          max(col("lp_e6")).as("max_e6"))
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
      |  SELECT b.doc, COUNT(*) AS n_bigrams,
      |    CAST(floor((${graft.core.Exact.sqlLsumAt(
             "ln(CAST(COALESCE(g.c2, 0) + 1 AS DOUBLE) / CAST(COALESCE(u.c1, 0) + voc.v AS DOUBLE))",
             "1000000000.0")} / COUNT(*)) * 1e6 + 0.5) AS BIGINT) AS lp_e6
      |  FROM bg b
      |  LEFT JOIN cbg g ON b.w1 = g.w1 AND b.w2 = g.w2
      |  LEFT JOIN cuni u ON b.w1 = u.w1
      |  CROSS JOIN voc
      |  GROUP BY b.doc),
      |sl AS (
      |  SELECT s.doc, s.n_bigrams, s.lp_e6, dd.lang
      |  FROM scored s JOIN documents dd ON s.doc = dd.doc_id),
      |cuts AS (
      |  SELECT lang,
      |    quantile_cont(CAST(lp_e6 AS DOUBLE), 1.0/3.0) AS t_lo,
      |    quantile_cont(CAST(lp_e6 AS DOUBLE), 2.0/3.0) AS t_hi
      |  FROM sl GROUP BY lang),
      |lab AS (
      |  SELECT sl.lang, sl.n_bigrams, sl.lp_e6,
      |    CASE WHEN sl.lp_e6 >= c.t_hi THEN 'head'
      |         WHEN sl.lp_e6 >= c.t_lo THEN 'middle'
      |         ELSE 'tail' END AS bucket
      |  FROM sl JOIN cuts c ON sl.lang = c.lang)
      |SELECT lang, bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
      |  MIN(lp_e6) AS min_e6, MAX(lp_e6) AS max_e6
      |FROM lab GROUP BY lang, bucket""".stripMargin))

  /** q149: Zipf rank-frequency fit — OLS slope/intercept of
    * ln(freq) on ln(rank) over the top-500 terms (rank by frequency
    * desc, term asc). The companion diagnostic to the Heaps curve
    * (q132): a healthy natural-language corpus fits slope ≈ −1;
    * generator loops and boilerplate floods bend it. The top-500 cut
    * is a bounded-heap TakeOrderedAndProject (never a global sort);
    * the 500-row fit then runs as closed-form sums in one tiny
    * aggregation. Outputs e6-floored so the transcendental ln agrees
    * across engines (the q89/q25 parity discipline). */
  val q149 = GQuery(
    "q149_zipf_fit",
    (s, d) => {
      val counts = documents(s, d)
        .select(explode(graft.text.TextFunctions.wsTokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("w").asc).limit(500)
      val ranked = counts.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("w").asc)).cast("long"))
        .withColumn("x", log(col("rank").cast("double")))
        .withColumn("y", log(col("freq").cast("double")))
      // closed-form OLS over the bounded term table: all sums are
      // scaled-long exact, so slope/intercept are order-independent
      val agg = ranked.agg(
        lcount(lit(1)).as("n"),
        lsumAt(col("x"), 1e9).as("sx"),
        lsumAt(col("y"), 1e9).as("sy"),
        lsumAt(col("x") * col("x"), 1e9).as("sxx"),
        lsumAt(col("x") * col("y"), 1e9).as("sxy"),
        min(col("freq")).as("min_freq"),
        max(col("freq")).as("max_freq"))
      agg.select(
        col("n"), col("min_freq"), col("max_freq"),
        floor(((col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("sxx") - col("sx") * col("sx") / col("n"))) * 1e6 + 0.5)
          .cast("long").as("slope_e6"),
        floor((col("sy") / col("n") -
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("sxx") - col("sx") * col("sx") / col("n"))) * col("sx") / col("n"))
          * 1e6 + 0.5).cast("long").as("intercept_e6"))
    },
    Some(s"""WITH counts AS (
      |  SELECT w, COUNT(*) AS freq
      |  FROM (SELECT unnest($wsSql) AS w FROM documents) t
      |  GROUP BY w ORDER BY freq DESC, w ASC LIMIT 500),
      |ranked AS (
      |  SELECT freq,
      |    row_number() OVER (ORDER BY freq DESC, w ASC) AS rank
      |  FROM counts),
      |xy AS (
      |  SELECT freq, ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
      |  FROM ranked),
      |sums AS (
      |  SELECT COUNT(*) AS n,
      |    ${graft.core.Exact.sqlLsumAt("x", "1000000000.0")} AS sx,
      |    ${graft.core.Exact.sqlLsumAt("y", "1000000000.0")} AS sy,
      |    ${graft.core.Exact.sqlLsumAt("x * x", "1000000000.0")} AS sxx,
      |    ${graft.core.Exact.sqlLsumAt("x * y", "1000000000.0")} AS sxy,
      |    MIN(freq) AS min_freq, MAX(freq) AS max_freq
      |  FROM xy)
      |SELECT n, CAST(min_freq AS BIGINT) AS min_freq,
      |  CAST(max_freq AS BIGINT) AS max_freq,
      |  CAST(floor(((sxy - sx * sy / n) / (sxx - sx * sx / n)) * 1e6 + 0.5) AS BIGINT) AS slope_e6,
      |  CAST(floor((sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx / n) * 1e6 + 0.5) AS BIGINT) AS intercept_e6
      |FROM sums""".stripMargin))

  /** q152: filter-agreement audit — the confusion matrix between the
    * rule-based document filter (the q139 Gopher bundle) and the
    * learned classifier gate (the q135 hashed-margin model).
    * Disagreement cells are where a curation pipeline looks first:
    * rule-only keeps expose what the classifier under-weights,
    * classifier-only keeps expose rules that over-fire. The corpus's
    * synthetic docs all sit under Gopher's 50-word floor, so the
    * fixture doubles even-id docs and appends a stopword tail —
    * making the rule verdict vary with the data and populating all
    * four cells. Both verdicts are exact integer/decimal arithmetic,
    * so every cell is engine-reproducible; one map-only rule pass +
    * the hashed-feature aggregation, joined on doc id. */
  private val clfW: Seq[Double] = (0 until 16).map(i => ((i * 37) % 16 - 8) / 8.0)
  private val clfB = 0.25

  /** Shared by q152/q175: the per-lang rule-vs-classifier confusion
    * cells (n_docs, n_both, n_rule_only, n_clf_only, n_neither). */
  private def agreementCells(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame = {
      val docs0 = documents(s, d)
      val enriched = when(col("doc_id") % 2 === 0,
        concat(col("text"), lit(" "), col("text"),
          lit(" the and of to in that have with")))
        .otherwise(col("text"))
      val docs = docs0.select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), enriched.as("text"))
      val rules = graft.text.GopherRules.flags(
          graft.core.Widen.widen(docs.select(col("doc_id"), col("lang"), col("text"))),
          "text")
        .select(col("doc_id"), col("lang"), col("keep").as("rule_keep"))
      val wArr = array(clfW.map(lit): _*)
      val z = graft.stats.HashedLogReg.hashedFeatures(docs, "doc_id", "text",
          dim = 16, salt = "fh")
        .withColumn("__t", element_at(wArr, col("idx").cast("int") + 1) * col("cnt"))
        .groupBy(col("__doc").as("doc_id"))
        .agg(dsum(col("__t")).as("__z0"))
      rules.join(z, Seq("doc_id"), "left")
        .withColumn("clf_keep", (coalesce(col("__z0"), lit(0.0)) + lit(clfB)) >= 0)
        .groupBy(col("lang"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          lcount(when(col("rule_keep") && col("clf_keep"), 1)).as("n_both"),
          lcount(when(col("rule_keep") && !col("clf_keep"), 1)).as("n_rule_only"),
          lcount(when(!col("rule_keep") && col("clf_keep"), 1)).as("n_clf_only"),
          lcount(when(!col("rule_keep") && !col("clf_keep"), 1)).as("n_neither"))
  }

  /** SQL mirror of [[agreementCells]] (one full statement). */
  private lazy val agreementSql: String = {
      val wCase = "CASE idx " + clfW.zipWithIndex.map { case (w, i) =>
        s"WHEN $i THEN $w"
      }.mkString(" ") + " END"
      s"""WITH e AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN doc_id % 2 = 0
      |      THEN text || ' ' || text || ' the and of to in that have with'
      |      ELSE text END AS text
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, lang,
      |    string_split_regex(trim(text), '\\s+') AS ws,
      |    string_split(text, chr(10)) AS lines, text AS t2
      |  FROM e),
      |r AS (
      |  SELECT doc_id, lang,
      |    len(ws) AS nw,
      |    list_sum(list_transform(ws, x -> length(x))) AS swl,
      |    len(regexp_extract_all(t2, '#|\\.\\.\\.')) AS nsym,
      |    len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS nbul,
      |    len(list_filter(lines, l -> regexp_matches(trim(l), '\\.\\.\\.$$'))) AS nell,
      |    len(lines) AS nl,
      |    len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS nalpha,
      |    len(list_filter(['the','be','to','of','and','that','have','with'],
      |      s -> list_contains(ws, s))) AS nstop
      |  FROM g),
      |rk AS (
      |  SELECT doc_id, lang,
      |    (nw BETWEEN 50 AND 100000
      |      AND swl >= 3 * nw AND swl <= 10 * nw
      |      AND 10 * nsym <= nw
      |      AND 10 * nbul <= 9 * nl
      |      AND 10 * nell <= 3 * nl
      |      AND 5 * nalpha >= 4 * nw
      |      AND nstop >= 2) AS rule_keep
      |  FROM r),
      |tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
      |        FROM e),
      |h AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5('fh-' || token), 1, 7)) AS BIGINT) % 16 AS idx
      |  FROM tok),
      |f AS (SELECT doc_id, idx, COUNT(*) AS cnt FROM h GROUP BY 1, 2),
      |z AS (
      |  SELECT doc_id,
      |    CAST(SUM(CAST(cnt * ($wCase) AS DECIMAL(38,6))) AS DOUBLE) AS z0
      |  FROM f GROUP BY doc_id),
      |v AS (
      |  SELECT rk.lang, rk.rule_keep,
      |    (COALESCE(z.z0, 0.0) + $clfB) >= 0 AS clf_keep
      |  FROM rk LEFT JOIN z ON rk.doc_id = z.doc_id)
      |SELECT lang, COUNT(*) AS n_docs,
      |  COUNT(CASE WHEN rule_keep AND clf_keep THEN 1 END) AS n_both,
      |  COUNT(CASE WHEN rule_keep AND NOT clf_keep THEN 1 END) AS n_rule_only,
      |  COUNT(CASE WHEN NOT rule_keep AND clf_keep THEN 1 END) AS n_clf_only,
      |  COUNT(CASE WHEN NOT rule_keep AND NOT clf_keep THEN 1 END) AS n_neither
      |FROM v GROUP BY lang""".stripMargin
  }

  val q152 = GQuery(
    "q152_filter_agreement",
    (s, d) => agreementCells(s, d),
    Some(agreementSql))

  /** q175: chance-corrected agreement — Cohen's κ per language over
    * the same rule-vs-classifier verdicts as q152. Raw agreement
    * (q152's cells) overstates consensus when both filters keep almost
    * everything; κ subtracts the agreement two independent filters
    * with these marginals would show by chance — the statistic an
    * annotation-quality audit reports before trusting a filter
    * ensemble. Pure integer cell counts → one double expression,
    * identical operation order on both engines, rounded at 6. */
  val q175 = GQuery(
    "q175_kappa_agreement",
    (s, d) => {
      val a = col("n_both"); val b = col("n_rule_only")
      val c = col("n_clf_only"); val d0 = col("n_neither")
      val n = col("n_docs")
      val po = (a + d0).cast("double") / n.cast("double")
      val pe = ((a + b) * (a + c) + (c + d0) * (b + d0)).cast("double") /
        (n * n).cast("double")
      agreementCells(s, d).select(
        col("lang"), n.as("n_docs"),
        round(po, 6).as("agree_rate"),
        round(pe, 6).as("chance_rate"),
        when(pe =!= 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
    },
    Some(s"""SELECT lang, n_docs,
      |  round(CAST(n_both + n_neither AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
      |    AS agree_rate,
      |  round(CAST((n_both + n_rule_only) * (n_both + n_clf_only)
      |      + (n_clf_only + n_neither) * (n_rule_only + n_neither) AS DOUBLE)
      |    / CAST(n_docs * n_docs AS DOUBLE), 6) AS chance_rate,
      |  CASE WHEN CAST((n_both + n_rule_only) * (n_both + n_clf_only)
      |      + (n_clf_only + n_neither) * (n_rule_only + n_neither) AS DOUBLE)
      |    / CAST(n_docs * n_docs AS DOUBLE) <> 1.0
      |  THEN round(
      |    (CAST(n_both + n_neither AS DOUBLE) / CAST(n_docs AS DOUBLE)
      |      - CAST((n_both + n_rule_only) * (n_both + n_clf_only)
      |          + (n_clf_only + n_neither) * (n_rule_only + n_neither) AS DOUBLE)
      |        / CAST(n_docs * n_docs AS DOUBLE))
      |    / (1.0 - CAST((n_both + n_rule_only) * (n_both + n_clf_only)
      |          + (n_clf_only + n_neither) * (n_rule_only + n_neither) AS DOUBLE)
      |        / CAST(n_docs * n_docs AS DOUBLE)), 6)
      |  END AS kappa
      |FROM ($agreementSql) cells""".stripMargin))

  /** q169: Poisson-bootstrap 95% CI of per-language mean document
    * length ([[graft.stats.Bootstrap.ciMean]]) — the uncertainty
    * report next to every point estimate the corpus publishes. One
    * pass over rows × 32 resamples with map-side combine (the
    * classical bootstrap's per-resample global reshuffle never
    * happens); seeded md5 draws through the Poisson(1) inverse CDF
    * make the interval replayable by any engine. */
  val q169 = GQuery(
    "q169_bootstrap_ci",
    (s, d) => graft.stats.Bootstrap.ciMean(
      documents(s, d), "lang", "doc_id", "n_chars", "bs-r6"),
    Some("""WITH rs AS (SELECT CAST(r AS BIGINT) AS r FROM range(32) t(r)),
      |w AS (
      |  SELECT d.lang, d.n_chars, rs.r,
      |    (CAST(('0x' || substr(md5('bs-r6' || CAST(d.doc_id AS VARCHAR) || ':' || CAST(rs.r AS VARCHAR)), 1, 13)) AS BIGINT) + 0.5)
      |      / 4503599627370496.0 AS u
      |  FROM documents d CROSS JOIN rs),
      |pw AS (
      |  SELECT lang, r, n_chars,
      |    CASE WHEN u < 0.3678794411714423 THEN 0
      |         WHEN u < 0.7357588823428846 THEN 1
      |         WHEN u < 0.9196986029286058 THEN 2
      |         WHEN u < 0.9810118431238462 THEN 3
      |         WHEN u < 0.9963401531726563 THEN 4
      |         WHEN u < 0.9994058151824183 THEN 5
      |         ELSE 6 END AS wgt
      |  FROM w),
      |e AS (
      |  SELECT lang, r,
      |    CAST(CAST(SUM(wgt * n_chars) AS BIGINT) AS DOUBLE)
      |      / CAST(CAST(SUM(wgt) AS BIGINT) AS DOUBLE) AS est
      |  FROM pw GROUP BY lang, r HAVING SUM(wgt) > 0),
      |rk AS (
      |  SELECT lang, est, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY est) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS nr
      |  FROM e),
      |ci AS (
      |  SELECT lang,
      |    ROUND(MAX(CASE WHEN rn = 1 THEN est END) * 0.225
      |        + MAX(CASE WHEN rn = 2 THEN est END) * 0.775, 4) AS ci_lo,
      |    ROUND(MAX(CASE WHEN rn = 31 THEN est END) * 0.775
      |        + MAX(CASE WHEN rn = 32 THEN est END) * 0.225, 4) AS ci_hi,
      |    MAX(nr) AS n_resamples
      |  FROM rk WHERE nr = 32 GROUP BY lang),
      |p AS (
      |  SELECT lang, ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS point_mean
      |  FROM documents GROUP BY lang)
      |SELECT p.lang, p.point_mean, ci.ci_lo, ci.ci_hi, ci.n_resamples
      |FROM p JOIN ci USING (lang)""".stripMargin))

  /** q213: WordPiece greedy longest-match segmentation census
    * ([[graft.text.WordPiece]]) — the BERT-style INFERENCE loop beside
    * the BPE trainer (q130): a census-built piece vocabulary
    * (initial/continuation forms, total-order top-V cap, chars always
    * in), every word segmented by longest-prefix matching, per-lang
    * fertility. The oracle precomputes a (word, pos) → longest-match
    * jump table relationally, then REPLAYS the greedy walk itself as a
    * recursive CTE — every segmentation decision, including the
    * whole-word-UNK arm, sits under the hash. */
  val q213 = {
    val L = 4      // max piece length
    val TopV = 512 // vocab cap beyond single chars
    GQuery(
      "q213_wordpiece_census",
      (s, d) => {
        val docs = documents(s, d)
        val v = graft.text.WordPiece.buildVocab(docs, "text", L, TopV)
        graft.text.WordPiece.segmentStats(docs, "text", v)
          .groupBy(col("lang"))
          .agg(sum(col("n_words")).as("n_words"),
            sum(col("n_pieces")).as("n_pieces"),
            sum(col("n_unk_words")).as("n_unk_words"))
          .withColumn("fertility_e6",
            floor(col("n_pieces").cast("double") / col("n_words") * 1e6 + 0.5)
              .cast("long"))
      },
      Some(s"""WITH RECURSIVE wl AS (
        |  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS w
        |  FROM documents),
        |wn AS (SELECT lang, w FROM wl WHERE w <> ''),
        |pp AS (
        |  SELECT w, s.i AS p FROM (SELECT w FROM wn) t,
        |    UNNEST(generate_series(1, length(w))) AS s(i)),
        |pieces AS (
        |  SELECT substr(w, p, l.j) AS piece,
        |    CASE WHEN p = 1 THEN 0 ELSE 1 END AS form
        |  FROM pp, UNNEST(generate_series(1, $L)) AS l(j)
        |  WHERE p + l.j - 1 <= length(w)),
        |census AS (SELECT piece, form, COUNT(*) AS c FROM pieces GROUP BY 1, 2),
        |vocab AS (
        |  SELECT piece, form FROM census WHERE length(piece) = 1
        |  UNION ALL
        |  SELECT piece, form FROM (
        |    SELECT piece, form FROM census WHERE length(piece) > 1
        |    ORDER BY c DESC, form, piece LIMIT $TopV) tv),
        |dw AS (SELECT DISTINCT w FROM wn),
        |dp AS (
        |  SELECT w, s.i AS p FROM dw,
        |    UNNEST(generate_series(1, length(w))) AS s(i)),
        |jump AS (
        |  SELECT dp.w, dp.p, MAX(l.j) AS jl
        |  FROM dp, UNNEST(generate_series(1, $L)) AS l(j), vocab v
        |  WHERE dp.p + l.j - 1 <= length(dp.w)
        |    AND v.piece = substr(dp.w, dp.p, l.j)
        |    AND v.form = CASE WHEN dp.p = 1 THEN 0 ELSE 1 END
        |  GROUP BY dp.w, dp.p),
        |walk AS (
        |  SELECT w, CAST(1 AS BIGINT) AS p, CAST(0 AS BIGINT) AS n,
        |    FALSE AS failed
        |  FROM dw
        |  UNION ALL
        |  SELECT wk.w, CAST(wk.p + COALESCE(j.jl, 1) AS BIGINT),
        |    CAST(wk.n + 1 AS BIGINT), j.jl IS NULL
        |  FROM walk wk LEFT JOIN jump j ON j.w = wk.w AND j.p = wk.p
        |  WHERE NOT wk.failed AND wk.p <= length(wk.w)),
        |fin AS (
        |  SELECT w, MAX(CASE WHEN failed THEN 1 ELSE 0 END) AS unk,
        |    MAX(CASE WHEN NOT failed AND p > length(w) THEN n END) AS np
        |  FROM walk GROUP BY w),
        |ppw AS (
        |  SELECT w, CASE WHEN unk = 1 THEN 1 ELSE np END AS n_pieces, unk
        |  FROM fin)
        |SELECT wn.lang, COUNT(*) AS n_words,
        |  CAST(SUM(ppw.n_pieces) AS BIGINT) AS n_pieces,
        |  CAST(SUM(ppw.unk) AS BIGINT) AS n_unk_words,
        |  CAST(FLOOR(CAST(SUM(ppw.n_pieces) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
        |    AS BIGINT) AS fertility_e6
        |FROM wn JOIN ppw ON wn.w = ppw.w
        |GROUP BY wn.lang""".stripMargin))
  }

  /** q215: unigram-LM (SentencePiece-style) tokenizer trained by hard
    * EM ([[graft.text.UnigramLm]]) — the third tokenizer family beside
    * BPE (q130) and WordPiece (q213): seed substring census →
    * 2 × (Viterbi segmentation → usage re-estimation) → per-lang
    * segmentation census. The path scores are LEFT-TO-RIGHT products
    * of count-ratio probabilities — no logs — so the oracle replays
    * the ENTIRE training loop: all THREE Viterbi walks (the two EM
    * rounds p0→p1→p2 plus the final census segmentation under p2) run
    * as recursive path enumerations with the identical (score desc,
    * pieces asc, chr(1)-joined path asc) tie order, and every EM count
    * in between is an integer census. The third walk matters: the
    * engine censuses under the TWICE-updated model, so an oracle that
    * stopped at walk2 (the p1 segmentation) would only agree when EM
    * has already converged — a latent gate break on other data. */
  val q215 = {
    val L = 4; val TopV = 512
    GQuery(
      "q215_unigram_lm_census",
      (s, d) => {
        val docs = documents(s, d)
        val model = graft.text.UnigramLm.train(docs, "text", L, TopV,
          emIters = 2)
        val segUdf = udf { (w: String) =>
          graft.text.UnigramLm.segment(w, model).getOrElse(Seq(w))
        }
        val words = docs
          .select(col("lang"),
            explode(split(trim(col("text")), "\\s+")).as("w"))
          .filter(col("w") =!= "")
        val pieces = words.select(col("lang"),
          explode(segUdf(col("w"))).as("piece"))
        val nw = words.groupBy(col("lang")).agg(lcount(lit(1)).as("n_words"))
        val pc = pieces.groupBy(col("lang"))
          .agg(lcount(lit(1)).as("n_pieces"),
            countDistinct(col("piece")).as("n_distinct_pieces"))
        nw.join(pc, Seq("lang"))
          .withColumn("fertility_e6",
            floor(col("n_pieces").cast("double") / col("n_words") * 1e6 + 0.5)
              .cast("long"))
      },
      Some(s"""WITH RECURSIVE wl AS (
        |  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS w
        |  FROM documents),
        |wn AS (SELECT lang, w FROM wl WHERE w <> ''),
        |wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM wn GROUP BY w),
        |sp AS (
        |  SELECT substr(wf.w, p.i, l.j) AS piece, wf.freq
        |  FROM wf, UNNEST(generate_series(1, length(wf.w))) AS p(i),
        |       UNNEST(generate_series(1, $L)) AS l(j)
        |  WHERE p.i + l.j - 1 <= length(wf.w)),
        |sc AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM sp GROUP BY piece),
        |v0 AS (
        |  SELECT piece, cnt FROM sc WHERE length(piece) = 1
        |  UNION ALL
        |  SELECT piece, cnt FROM (
        |    SELECT piece, cnt FROM sc WHERE length(piece) > 1
        |    ORDER BY cnt DESC, piece LIMIT $TopV) t0v),
        |p0 AS (
        |  SELECT piece, cnt / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM v0) AS prob
        |  FROM v0),
        |walk1 AS (
        |  SELECT w, CAST(1 AS BIGINT) AS p, CAST(1.0 AS DOUBLE) AS score,
        |    CAST(0 AS BIGINT) AS np, '' AS path
        |  FROM wf
        |  UNION ALL
        |  SELECT wk.w, wk.p + length(v.piece), wk.score * v.prob, wk.np + 1,
        |    CASE WHEN wk.path = '' THEN v.piece
        |         ELSE wk.path || chr(1) || v.piece END
        |  FROM walk1 wk JOIN p0 v
        |    ON v.piece = substr(wk.w, CAST(wk.p AS INTEGER), length(v.piece))
        |  WHERE wk.p <= length(wk.w)),
        |best1 AS (
        |  SELECT w, path, np FROM (
        |    SELECT w, path, np, row_number() OVER (
        |      PARTITION BY w ORDER BY score DESC, np ASC, path ASC) AS rn
        |    FROM walk1 WHERE p = length(w) + 1) b WHERE rn = 1),
        |up1 AS (SELECT w, unnest(string_split(path, chr(1))) AS piece FROM best1),
        |u1 AS (
        |  SELECT up1.piece, CAST(SUM(wf.freq) AS BIGINT) AS cnt
        |  FROM up1 JOIN wf ON up1.w = wf.w GROUP BY up1.piece),
        |p1 AS (
        |  SELECT piece, cnt / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM u1) AS prob
        |  FROM u1),
        |walk2 AS (
        |  SELECT w, CAST(1 AS BIGINT) AS p, CAST(1.0 AS DOUBLE) AS score,
        |    CAST(0 AS BIGINT) AS np, '' AS path
        |  FROM wf
        |  UNION ALL
        |  SELECT wk.w, wk.p + length(v.piece), wk.score * v.prob, wk.np + 1,
        |    CASE WHEN wk.path = '' THEN v.piece
        |         ELSE wk.path || chr(1) || v.piece END
        |  FROM walk2 wk JOIN p1 v
        |    ON v.piece = substr(wk.w, CAST(wk.p AS INTEGER), length(v.piece))
        |  WHERE wk.p <= length(wk.w)),
        |best2 AS (
        |  SELECT w, path, np FROM (
        |    SELECT w, path, np, row_number() OVER (
        |      PARTITION BY w ORDER BY score DESC, np ASC, path ASC) AS rn
        |    FROM walk2 WHERE p = length(w) + 1) b WHERE rn = 1),
        |up2 AS (SELECT w, unnest(string_split(path, chr(1))) AS piece FROM best2),
        |u2 AS (
        |  SELECT up2.piece, CAST(SUM(wf.freq) AS BIGINT) AS cnt
        |  FROM up2 JOIN wf ON up2.w = wf.w GROUP BY up2.piece),
        |p2 AS (
        |  SELECT piece, cnt / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM u2) AS prob
        |  FROM u2),
        |walk3 AS (
        |  SELECT w, CAST(1 AS BIGINT) AS p, CAST(1.0 AS DOUBLE) AS score,
        |    CAST(0 AS BIGINT) AS np, '' AS path
        |  FROM wf
        |  UNION ALL
        |  SELECT wk.w, wk.p + length(v.piece), wk.score * v.prob, wk.np + 1,
        |    CASE WHEN wk.path = '' THEN v.piece
        |         ELSE wk.path || chr(1) || v.piece END
        |  FROM walk3 wk JOIN p2 v
        |    ON v.piece = substr(wk.w, CAST(wk.p AS INTEGER), length(v.piece))
        |  WHERE wk.p <= length(wk.w)),
        |best3 AS (
        |  SELECT w, path, np FROM (
        |    SELECT w, path, np, row_number() OVER (
        |      PARTITION BY w ORDER BY score DESC, np ASC, path ASC) AS rn
        |    FROM walk3 WHERE p = length(w) + 1) b WHERE rn = 1),
        |up3 AS (SELECT w, unnest(string_split(path, chr(1))) AS piece FROM best3),
        |nw AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
        |         CAST(SUM(b.np) AS BIGINT) AS n_pieces
        |       FROM wn JOIN best3 b ON wn.w = b.w GROUP BY lang),
        |nd AS (SELECT lang, CAST(COUNT(DISTINCT u.piece) AS BIGINT)
        |         AS n_distinct_pieces
        |       FROM wn JOIN up3 u ON wn.w = u.w GROUP BY lang)
        |SELECT nw.lang, nw.n_words, nw.n_pieces, nd.n_distinct_pieces,
        |  CAST(FLOOR(CAST(nw.n_pieces AS DOUBLE) / nw.n_words * 1e6 + 0.5)
        |    AS BIGINT) AS fertility_e6
        |FROM nw JOIN nd ON nw.lang = nd.lang""".stripMargin))
  }

  /** q220: vocabulary-coverage estimation per language
    * ([[graft.text.Vocab.coverageEstimate]]) — Good–Turing unseen mass
    * P₀ = f₁/N and bias-corrected Chao1 richness V + f₁(f₁−1)/(2(f₂+1))
    * from the frequency-of-frequencies census; integer counts until
    * one IEEE division per estimate, so the oracle replays exactly. */
  val q220 = GQuery(
    "q220_vocab_coverage",
    (s, d) => graft.text.Vocab.coverageEstimate(
      documents(s, d), Seq("lang"), "text"),
    Some("""WITH toks AS (
      |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents),
      |cnts AS (
      |  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM toks WHERE tok <> '' GROUP BY lang, tok),
      |cen AS (
      |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS vocab,
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      |  FROM cnts GROUP BY lang)
      |SELECT lang, n_tokens, vocab, f1, f2,
      |  CAST(f1 AS DOUBLE) / n_tokens AS p_unseen,
      |  vocab + CAST(f1 * (f1 - 1) AS DOUBLE) / (2.0 * (f2 + 1)) AS chao1
      |FROM cen""".stripMargin))

  /** q224: interpolated Kneser–Ney bigram scoring
    * ([[graft.text.LangModel.trainKn]]/[[graft.text.LangModel.scoreKn]])
    * — the production-grade smoothing behind CCNet-style perplexity
    * filters, beside q146's add-one baseline: model counted from the
    * doc_id % 3 ≠ 0 slice, EVERY document scored, row-level gate on
    * the e6-floored mean log-probability. The oracle replays the whole
    * thing — bigram census, context mass Σc2 (NOT raw unigram counts:
    * doc-final tokens are no context), continuation counts, and the
    * discount/backoff arithmetic in the engine's exact operation
    * order. */
  val q224 = GQuery(
    "q224_kneser_ney_lm",
    (s, d) => {
      val docs = documents(s, d)
      val model = LangModel.trainKn(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text")
      LangModel.scoreKn(docs, model, "doc_id", "text")
        .withColumn("kn_e6", floor(col("logprob") * 1e6 + 0.5).cast("long"))
        .join(docs.select(col("doc_id").as("doc"), col("lang")), Seq("doc"))
        .select(col("doc"), col("lang"), col("n_bigrams"), col("kn_e6"))
    },
    Some(s"""WITH bg AS (
      |  SELECT doc_id AS doc, ws[i] AS w1, ws[i+1] AS w2
      |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)),
      |cbg AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
      |  FROM bg WHERE doc % 3 <> 0 GROUP BY 1, 2),
      |ctx AS (
      |  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
      |    CAST(COUNT(*) AS BIGINT) AS n1p_left
      |  FROM cbg GROUP BY 1),
      |cont AS (
      |  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_right FROM cbg GROUP BY 1),
      |sca AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cbg) AS b,
      |    (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) FROM
      |      (SELECT unnest($wsSql) AS w FROM documents WHERE doc_id % 3 <> 0) tk)
      |      AS v),
      |scored AS (
      |  SELECT b.doc, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(floor((${graft.core.Exact.sqlLsumAt(
             "ln(CASE WHEN c.c1 IS NOT NULL AND c.c1 > 0 THEN " +
               "(GREATEST(CAST(COALESCE(g.c2, 0) AS DOUBLE) - 0.75, 0.0) " +
               "+ 0.75 * CAST(COALESCE(c.n1p_left, 0) AS DOUBLE) " +
               "* (CAST(COALESCE(r.n1p_right, 0) + 1 AS DOUBLE) " +
               "/ CAST(s.b + s.v AS DOUBLE))) / CAST(c.c1 AS DOUBLE) " +
               "ELSE CAST(COALESCE(r.n1p_right, 0) + 1 AS DOUBLE) " +
               "/ CAST(s.b + s.v AS DOUBLE) END)",
             "1000000000.0")} / COUNT(*)) * 1e6 + 0.5) AS BIGINT) AS kn_e6
      |  FROM bg b
      |  LEFT JOIN cbg g ON b.w1 = g.w1 AND b.w2 = g.w2
      |  LEFT JOIN ctx c ON b.w1 = c.w1
      |  LEFT JOIN cont r ON b.w2 = r.w2
      |  CROSS JOIN sca s
      |  GROUP BY b.doc)
      |SELECT sc.doc, dd.lang, sc.n_bigrams, sc.kn_e6
      |FROM scored sc JOIN documents dd ON sc.doc = dd.doc_id""".stripMargin))

  /** q237: extractability census (the Carlini et al. k-extractability
    * shape, USENIX Security '21): a training example is at risk of
    * verbatim extraction when a PREFIX of it recurs across documents
    * and the CONTINUATION after that prefix is deterministic — a model
    * completing the shared prefix reproduces the unique continuation.
    * Per prefix length L ∈ {16, 32, 64}: how many exact-prefix groups
    * exist, how many documents sit in shared groups (≥2 docs), and how
    * many shared groups have ONE distinct 32-char continuation (the
    * extraction-risk bucket). Three grouped censuses over substr keys
    * — one scan, no joins, no windows. */
  val q237 = {
    val Ls = Seq(16, 32, 64)
    GQuery(
      "q237_extractability",
      (s, d) => {
        val docs = documents(s, d)
        Ls.map { l =>
          docs.filter(length(col("text")) >= l)
            .select(substring(col("text"), 1, l).as("pfx"),
              substring(col("text"), l + 1, 32).as("cont"))
            .groupBy(col("pfx"))
            .agg(count(lit(1)).as("n"),
              countDistinct(col("cont")).as("nc"))
            .agg(
              lit(l).as("prefix_len"),
              lcount(lit(1)).as("n_groups"),
              sum(when(col("n") > 1, col("n")).otherwise(lit(0L)))
                .as("n_shared_docs"),
              sum(when(col("n") > 1 && col("nc") === 1, lit(1L))
                .otherwise(lit(0L))).as("n_extractable_groups"))
        }.reduce(_ unionByName _)
      },
      Some(s"""WITH g AS (
        |  SELECT l.len AS prefix_len, substr(text, 1, l.len) AS pfx,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT substr(text, l.len + 1, 32)) AS BIGINT) AS nc
        |  FROM documents, (VALUES (16), (32), (64)) AS l(len)
        |  WHERE length(text) >= l.len
        |  GROUP BY 1, 2)
        |SELECT prefix_len, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_shared_docs,
        |  CAST(SUM(CASE WHEN n > 1 AND nc = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_extractable_groups
        |FROM g GROUP BY prefix_len""".stripMargin))
  }

  /** q275: Gini concentration of per-source character mass, per
    * language — the corpus-balance diagnostic behind domain caps
    * (q150): a language whose bytes come 90% from one source is one
    * takedown away from losing its corpus. Gini over the n source
    * masses x₍₁₎≤…≤x₍ₙ₎ is (2·Σi·x₍ᵢ₎ − (n+1)·Σx)/(n·Σx) — everything
    * above the single final division is INTEGER (rank window over the
    * 20-source frame, decimal-routed products), so the coefficient is
    * engine-exact. Scale shape: raw docs fold map-side into the
    * (lang, source) frame — bounded by the catalog, not the corpus. */
  val q275 = GQuery(
    "q275_source_gini",
    (s, d) => {
      val mass = documents(s, d).groupBy(col("lang"), col("source"))
        .agg(sum(col("n_chars")).as("x"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("x"), col("source"))
      mass.withColumn("i", row_number().over(w).cast("long"))
        .groupBy(col("lang"))
        .agg(lcount(lit(1)).as("n_sources"),
          sum(col("x")).as("total_chars"),
          sum((col("i") * col("x")).cast(DecimalType(38, 0))).as("__ix"))
        .withColumn("gini", round(
          (lit(2) * col("__ix") - (col("n_sources") + 1) *
            col("total_chars").cast(DecimalType(38, 0))).cast("double") /
            (col("n_sources") * col("total_chars")).cast("double"), 6))
        .drop("__ix")
    },
    Some("""WITH mass AS (
      |  SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS x
      |  FROM documents GROUP BY 1, 2),
      |rk AS (
      |  SELECT lang, x,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY x, source) AS i
      |  FROM mass),
      |agg AS (
      |  SELECT lang, COUNT(*) AS n_sources,
      |    CAST(SUM(x) AS BIGINT) AS total_chars,
      |    SUM(CAST(i * x AS HUGEINT)) AS ix
      |  FROM rk GROUP BY lang)
      |SELECT lang, CAST(n_sources AS BIGINT) AS n_sources, total_chars,
      |  round(CAST(2 * ix - (n_sources + 1) * CAST(total_chars AS HUGEINT)
      |      AS DOUBLE) /
      |    CAST(n_sources * total_chars AS DOUBLE), 6) AS gini
      |FROM agg""".stripMargin))

  /** q276: temperature-weighted language sampling (the mT5 / XLM-R
    * multilingual mixing recipe, α = 1/2): sampling mass ∝ c_l^α
    * upweights tail languages without letting them dominate. The ¾-
    * power trick (q243) adapted to α = ½: c^½ = sqrt(c) is ONE
    * exactly-rounded IEEE op, and `floor(sqrt(c)·10⁶ + 0.5)` makes the
    * mass an int64, so the per-language ppm allocation of a 1M-token
    * epoch budget is a truncating integer division — bit-exact on any
    * engine, no transcendental rounding channel. Map-side fold to the
    * 5-language frame; the totals cross is the 1-row scalar pattern. */
  val q276 = GQuery(
    "q276_temperature_mix",
    (s, d) => {
      val c = documents(s, d)
        .select(col("lang"),
          size(graft.text.TextFunctions.wsTokens(col("text"))).cast("long").as("t"))
        .groupBy(col("lang")).agg(sum(col("t")).as("n_tokens"))
        .withColumn("sqrt_e6",
          floor(sqrt(col("n_tokens").cast("double")) * 1e6 + lit(0.5)).cast("long"))
      val tot = c.agg(sum(col("sqrt_e6")).as("__tot"))
      c.crossJoin(tot) // 1-row scalar broadcast
        .select(col("lang"), col("n_tokens"), col("sqrt_e6"),
          expr("(sqrt_e6 * 1000000) div __tot").as("alloc_ppm"),
          round(col("sqrt_e6").cast("double") / col("__tot").cast("double"), 6)
            .as("weight"))
    },
    Some(s"""WITH c AS (
      |  SELECT lang, CAST(SUM(len($wsSql)) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |sq AS (
      |  SELECT lang, n_tokens,
      |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
      |      AS sqrt_e6
      |  FROM c),
      |tot AS (SELECT CAST(SUM(sqrt_e6) AS BIGINT) AS t FROM sq)
      |SELECT lang, n_tokens, sqrt_e6,
      |  CAST((sqrt_e6 * 1000000) // tot.t AS BIGINT) AS alloc_ppm,
      |  round(CAST(sqrt_e6 AS DOUBLE) / CAST(tot.t AS DOUBLE), 6) AS weight
      |FROM sq, tot""".stripMargin))

  /** q314: Hill tail-index estimate of the per-source document-length
    * distribution — the heavy-tail diagnostic beside q149's Zipf fit
    * (Zipf checks the RANK law of terms; Hill asks how fat each
    * source's LENGTH tail is: α̂ = k / Σᵢ₌₁..k ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the
    * top k+1 order statistics, k = min(20, n−1)). A source whose α̂
    * collapses toward 1 is dominated by giant outlier documents —
    * the packing/budget operators' worst case. The top-(k+1) cut is
    * one bounded rank window; ln terms go through the e9 scaled-long
    * sum (q149's parity discipline) so the fold is order-independent;
    * α̂ is one final IEEE division, rounded 6, NULL when the top
    * k+1 values are all equal (zero tail information). */
  val q314 = GQuery(
    "q314_hill_tail_index",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("source")).orderBy(col("x").desc, col("doc_id"))
      val ranked = documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars").as("x"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(W.partitionBy(col("source"))))
        .withColumn("k", least(lit(20L), col("cnt") - 1))
        .filter(col("rn") <= col("k") + 1)
        .localCheckpoint(eager = false) // the k+1 cut feeds both passes
      val xk1 = ranked.filter(col("rn") === col("k") + 1)
        .select(col("source"), col("x").as("xk1"))
      ranked.filter(col("rn") <= col("k"))
        .join(broadcast(xk1), Seq("source"))
        .groupBy(col("source"))
        .agg(max(col("cnt")).as("n"), max(col("k")).as("k"),
          lsumAt(log(col("x").cast("double") / col("xk1").cast("double")), 1e9)
            .as("__h"))
        .select(col("source"), col("n"), col("k"),
          expr("CASE WHEN __h > 0 THEN round(CAST(k AS DOUBLE) / __h, 6) END")
            .as("hill_alpha"))
        .orderBy(col("source"))
    },
    Some(s"""WITH ranked AS MATERIALIZED (
      |  SELECT source, n_chars AS x,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS cnt,
      |    LEAST(20, CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) - 1)
      |      AS k
      |  FROM documents
      |  QUALIFY rn <= k + 1),
      |xk1 AS (
      |  SELECT source, x AS xk1 FROM ranked WHERE rn = k + 1),
      |terms AS (
      |  SELECT r.source, r.cnt, r.k,
      |    ln(CAST(r.x AS DOUBLE) / CAST(x1.xk1 AS DOUBLE)) AS t
      |  FROM ranked r JOIN xk1 x1 ON r.source = x1.source
      |  WHERE r.rn <= r.k),
      |agg AS (
      |  SELECT source, CAST(MAX(cnt) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k,
      |    ${graft.core.Exact.sqlLsumAt("t", "1000000000.0")} AS h
      |  FROM terms GROUP BY source)
      |SELECT source, n, k,
      |  CASE WHEN h > 0 THEN round(CAST(k AS DOUBLE) / h, 6) END AS hill_alpha
      |FROM agg ORDER BY source""".stripMargin))

  /** q319: Good–Turing unseen-mass estimate per language — how much
    * probability mass the NEXT document's vocabulary will be novel
    * (Gale & Sampson 1995's P₀ = n₁/N): the corpus-saturation signal
    * beside q132's Heaps curve (Heaps plots growth; Good–Turing prices
    * what's left). Frequency-of-frequencies off the token census
    * (n₁ singletons, n₂ doubletons, V vocabulary, N mass), unseen
    * mass and the Turing-discounted singleton probability
    * r* = 2·n₂/n₁ ship as exact ppm (truncating ÷). Two count
    * shuffles (token census, then the bounded freq-of-freq fold). */
  val q319 = GQuery(
    "q319_good_turing_unseen",
    (s, d) => {
      val counts = documents(s, d)
        .select(col("lang"),
          explode(graft.text.TextFunctions.wsTokens(col("text"))).as("w"))
        .groupBy(col("lang"), col("w"))
        .agg(lcount(lit(1)).as("freq"))
      counts.groupBy(col("lang"))
        .agg(
          lcount(lit(1)).as("vocab"),
          sum(col("freq")).as("n_tokens"),
          coalesce(sum(when(col("freq") === 1, 1L)), lit(0L)).as("n1"),
          coalesce(sum(when(col("freq") === 2, 1L)), lit(0L)).as("n2"))
        .select(col("lang"), col("vocab"), col("n_tokens"), col("n1"),
          col("n2"),
          expr("(n1 * 1000000) div n_tokens").as("unseen_ppm"),
          expr("""CASE WHEN n1 > 0 THEN
            |(2 * n2 * 1000000) div n1 END""".stripMargin)
            .as("turing_r1_e6"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH counts AS (
      |  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS freq
      |  FROM (SELECT lang, unnest($wsSql) AS w FROM documents) t
      |  GROUP BY lang, w),
      |fof AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS vocab,
      |    CAST(SUM(freq) AS BIGINT) AS n_tokens,
      |    COALESCE(CAST(SUM(CASE WHEN freq = 1 THEN 1 END) AS BIGINT), 0) AS n1,
      |    COALESCE(CAST(SUM(CASE WHEN freq = 2 THEN 1 END) AS BIGINT), 0) AS n2
      |  FROM counts GROUP BY lang)
      |SELECT lang, vocab, n_tokens, n1, n2,
      |  (n1 * 1000000) // n_tokens AS unseen_ppm,
      |  CASE WHEN n1 > 0 THEN
      |  (2 * n2 * 1000000) // n1 END AS turing_r1_e6
      |FROM fof ORDER BY lang""".stripMargin))

  /** q325: readability census — Flesch Reading Ease and
    * Flesch–Kincaid grade per (lang, source), the curriculum /
    * difficulty-mix signal a pretraining recipe reads beside the
    * q139 Gopher gates (Gopher filters junk; readability stratifies
    * what survives). Per document three integer counts: words
    * (\S+ runs), sentences ([.!?]+ runs, floored at 1 so headline
    * fragments don't divide by zero), and the classic vowel-group
    * syllable heuristic ([aeiouy]+ runs on the lowercased text — the
    * standard dictionary-free approximation). The group FRE/FKGL use
    * the summed counts (mass-weighted, not per-doc-averaged), so the
    * whole query is one map-only regex pass + one bounded groupBy;
    * the constants are the published Flesch coefficients. Both
    * engines run RE2-compatible patterns on identical strings, so
    * the counts are exact; the two divisions round at e6. */
  val q325 = GQuery(
    "q325_readability_census",
    (s, d) => {
      val per = documents(s, d).select(col("lang"), col("source"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast("long").as("n_words"),
        greatest(lit(1L),
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
            .cast("long")).as("n_sents"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("n_syll"))
      per.groupBy(col("lang"), col("source"))
        .agg(lcount(lit(1)).as("n_docs"),
          sum(col("n_words")).as("words"),
          sum(col("n_sents")).as("sents"),
          sum(col("n_syll")).as("sylls"))
        .withColumn("wps", col("words").cast("double") / col("sents").cast("double"))
        .withColumn("spw", col("sylls").cast("double") / col("words").cast("double"))
        .select(col("lang"), col("source"), col("n_docs"),
          col("words"), col("sents"), col("sylls"),
          round(lit(206.835) - lit(1.015) * col("wps") - lit(84.6) * col("spw"), 6)
            .as("fre"),
          round(lit(0.39) * col("wps") + lit(11.8) * col("spw") - lit(15.59), 6)
            .as("fk_grade"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""WITH per AS (
      |  SELECT lang, source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
      |    GREATEST(CAST(1 AS BIGINT),
      |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sents,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
      |      AS n_syll
      |  FROM documents),
      |g AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_words) AS BIGINT) AS words,
      |    CAST(SUM(n_sents) AS BIGINT) AS sents,
      |    CAST(SUM(n_syll) AS BIGINT) AS sylls
      |  FROM per GROUP BY lang, source)
      |SELECT lang, source, n_docs, words, sents, sylls,
      |  round(206.835 - 1.015 * (CAST(words AS DOUBLE) / CAST(sents AS DOUBLE))
      |    - 84.6 * (CAST(sylls AS DOUBLE) / CAST(words AS DOUBLE)), 6) AS fre,
      |  round(0.39 * (CAST(words AS DOUBLE) / CAST(sents AS DOUBLE))
      |    + 11.8 * (CAST(sylls AS DOUBLE) / CAST(words AS DOUBLE)) - 15.59, 6)
      |    AS fk_grade
      |FROM g ORDER BY lang, source""".stripMargin))

  /** q331: RAKE keyphrase extraction (Rose et al. 2010) — the
    * phrase-grain keyword miner beside q267's TextRank (TextRank
    * ranks WORDS by co-occurrence centrality; RAKE scores candidate
    * PHRASES — maximal stopword-free token runs — by member-word
    * degree/frequency ratios, no graph iteration at all). Stopword
    * delimiters {a, the}; word score = deg(w)/freq(w) where deg sums
    * the lengths of every phrase containing the occurrence; phrase
    * score sums member-word scores (decimal-routed). Top 3 phrases
    * per language by (score, phrase). One token explode + segment
    * window is the only fact-sized work; word scores live on the
    * ~32-word vocabulary frame. */
  val q331 = GQuery(
    "q331_rake_keyphrases",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val toks = documents(s, d)
        .select(col("doc_id"), col("lang"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .filter(col("word") =!= "")
        .withColumn("is_stop", col("word").isin("a", "the"))
        .withColumn("seg",
          sum(when(col("is_stop"), 1L).otherwise(0L))
            .over(W.partitionBy(col("doc_id")).orderBy(col("pos"))
              .rowsBetween(W.unboundedPreceding, W.currentRow)))
      val members = toks.filter(!col("is_stop"))
        .withColumn("plen",
          count(lit(1)).over(W.partitionBy(col("doc_id"), col("seg"))))
      val wordScore = members.groupBy(col("word"))
        .agg(lcount(lit(1)).as("freq"), sum(col("plen")).as("deg"))
        .select(col("word"),
          (col("deg").cast("double") / col("freq").cast("double")).as("score"))
      val phrases = members.groupBy(col("doc_id"), col("lang"), col("seg"))
        .agg(concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(pos, word))), x -> x.word)"))
          .as("phrase"))
      val occ = phrases.groupBy(col("lang"), col("phrase"))
        .agg(lcount(lit(1)).as("n_occ"))
      val scored = occ
        .select(col("lang"), col("phrase"), col("n_occ"),
          explode(split(col("phrase"), " ")).as("word"))
        .join(broadcast(wordScore), Seq("word"))
        .groupBy(col("lang"), col("phrase"), col("n_occ"))
        .agg(dsum(col("score")).as("score"))
      scored
        .withColumn("rk", row_number().over(W.partitionBy(col("lang"))
          .orderBy(col("score").desc, col("phrase").asc)))
        .filter(col("rk") <= 3)
        .select(col("lang"), col("rk").cast("long").as("rk"), col("phrase"),
          col("n_occ"), round(col("score"), 6).as("score"))
        .orderBy(col("lang"), col("rk"))
    },
    Some(s"""WITH toks AS (
      |  SELECT doc_id, lang, generate_subscripts(ws, 1) AS pos,
      |    unnest(ws) AS word
      |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws
      |        FROM documents)),
      |seg AS (
      |  SELECT doc_id, lang, pos, word, word IN ('a', 'the') AS is_stop,
      |    SUM(CASE WHEN word IN ('a', 'the') THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos
      |            ROWS UNBOUNDED PRECEDING) AS seg
      |  FROM toks WHERE word <> ''),
      |members AS (
      |  SELECT doc_id, lang, pos, word, seg,
      |    COUNT(*) OVER (PARTITION BY doc_id, seg) AS plen
      |  FROM seg WHERE NOT is_stop),
      |ws AS (
      |  SELECT word, CAST(SUM(plen) AS DOUBLE) / COUNT(*) AS score
      |  FROM members GROUP BY word),
      |phrases AS (
      |  SELECT doc_id, lang, seg,
      |    string_agg(word, ' ' ORDER BY pos) AS phrase
      |  FROM members GROUP BY doc_id, lang, seg),
      |occ AS (
      |  SELECT lang, phrase, CAST(COUNT(*) AS BIGINT) AS n_occ
      |  FROM phrases GROUP BY lang, phrase),
      |scored AS (
      |  SELECT o.lang, o.phrase, o.n_occ,
      |    CAST(SUM(CAST(w.score AS DECIMAL(38,6))) AS DOUBLE) AS score
      |  FROM (SELECT lang, phrase, n_occ,
      |          unnest(string_split(phrase, ' ')) AS word FROM occ) o
      |  JOIN ws w ON o.word = w.word
      |  GROUP BY o.lang, o.phrase, o.n_occ)
      |SELECT lang, CAST(rk AS BIGINT) AS rk, phrase, n_occ,
      |  round(score, 6) AS score
      |FROM (SELECT lang, phrase, n_occ, score,
      |        row_number() OVER (PARTITION BY lang
      |          ORDER BY score DESC, phrase ASC) AS rk
      |      FROM scored)
      |WHERE rk <= 3 ORDER BY lang, rk""".stripMargin))

  /** q333: Heaps'-law fit — the vocabulary-growth health check beside
    * q149's Zipf fit (Zipf: rank-frequency within a snapshot; Heaps:
    * V(n) = K·n^β as the corpus GROWS — the curve that predicts how
    * much new vocabulary another 10× of crawl will bring). Cumulative
    * growth is made distributed-exact by bucketing docs into 10
    * corpus prefixes in doc_id order: each word contributes to the
    * bucket of its FIRST occurrence (min doc-rank — one groupBy, no
    * sequential scan), token mass sums per bucket, and both cumulate
    * over the 10-row frame. OLS on (ln n_k, ln V_k) with
    * decimal-routed moment sums gives β and K = exp(ȳ − β·x̄).
    * Output: the 10 checkpoints with the shared fit. */
  val q333 = GQuery(
    "q333_heaps_law",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val docs = documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .withColumn("rn",
          row_number().over(W.orderBy(col("doc_id"))))
      val nTot = docs.agg(lcount(lit(1)).as("n_docs"))
      val withB = docs.crossJoin(broadcast(nTot))
        .withColumn("b", expr("((rn - 1) * 10) div n_docs + 1"))
      val tokB = withB
        .select(col("b"),
          size(filter(col("ws"), w => w =!= "")).cast("long").as("n_toks"))
        .groupBy(col("b")).agg(sum(col("n_toks")).as("toks"))
      val firstB = withB
        .select(col("b"), explode(col("ws")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(min(col("b")).as("fb"))
        .groupBy(col("fb").as("b")).agg(lcount(lit(1)).as("new_words"))
      val cum = tokB.join(firstB, Seq("b"), "left")
        .select(col("b"), col("toks"),
          coalesce(col("new_words"), lit(0L)).as("new_words"))
        .withColumn("n_tokens", sum(col("toks")).over(
          W.orderBy(col("b")).rowsBetween(W.unboundedPreceding, W.currentRow)))
        .withColumn("vocab", sum(col("new_words")).over(
          W.orderBy(col("b")).rowsBetween(W.unboundedPreceding, W.currentRow)))
        .select(col("b"), col("n_tokens"), col("vocab"),
          log(col("n_tokens").cast("double")).as("x"),
          log(col("vocab").cast("double")).as("y"))
      val fit = cum.agg(lcount(lit(1)).as("m"),
          dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
          dsum(col("x") * col("x")).as("sxx"), dsum(col("x") * col("y")).as("sxy"))
        .select(
          ((col("sxy") - col("sx") * col("sy") / col("m"))
            / (col("sxx") - col("sx") * col("sx") / col("m"))).as("beta"),
          col("sx"), col("sy"), col("m"))
        .select(col("beta"),
          exp(col("sy") / col("m") - col("beta") * col("sx") / col("m")).as("kc"))
      cum.crossJoin(broadcast(fit))
        .select(col("b"), col("n_tokens"), col("vocab"),
          round(col("beta"), 6).as("beta"), round(col("kc"), 6).as("k_heaps"))
        .orderBy(col("b"))
    },
    Some(s"""WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws,
      |    row_number() OVER (ORDER BY doc_id) AS rn,
      |    COUNT(*) OVER () AS n_docs
      |  FROM documents),
      |wb AS (
      |  SELECT doc_id, ws, ((rn - 1) * 10) // n_docs + 1 AS b FROM docs),
      |tokb AS (
      |  SELECT b, CAST(SUM(len(list_filter(ws, w -> w <> ''))) AS BIGINT)
      |    AS toks
      |  FROM wb GROUP BY b),
      |firstb AS (
      |  SELECT fb AS b, CAST(COUNT(*) AS BIGINT) AS new_words FROM (
      |    SELECT word, MIN(b) AS fb FROM (
      |      SELECT b, unnest(ws) AS word FROM wb) t
      |    WHERE word <> '' GROUP BY word)
      |  GROUP BY fb),
      |cum AS (
      |  SELECT t.b,
      |    CAST(SUM(t.toks) OVER (ORDER BY t.b ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS n_tokens,
      |    CAST(SUM(COALESCE(f.new_words, 0))
      |      OVER (ORDER BY t.b ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab
      |  FROM tokb t LEFT JOIN firstb f ON t.b = f.b),
      |pts AS (
      |  SELECT b, n_tokens, vocab, ln(CAST(n_tokens AS DOUBLE)) AS x,
      |    ln(CAST(vocab AS DOUBLE)) AS y
      |  FROM cum),
      |fit0 AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
      |    ${sqlDsum("x")} AS sx, ${sqlDsum("y")} AS sy,
      |    ${sqlDsum("x * x")} AS sxx, ${sqlDsum("x * y")} AS sxy
      |  FROM pts),
      |fit AS (
      |  SELECT (sxy - sx * sy / m) / (sxx - sx * sx / m) AS beta, sx, sy, m
      |  FROM fit0),
      |fit2 AS (
      |  SELECT beta, exp(sy / m - beta * sx / m) AS kc FROM fit)
      |SELECT p.b, p.n_tokens, p.vocab, round(f.beta, 6) AS beta,
      |  round(f.kc, 6) AS k_heaps
      |FROM pts p CROSS JOIN fit2 f ORDER BY p.b""".stripMargin))

  /** q342: information-gain census — the feature-selection signal a
    * router/classifier pipeline reads before training (which cheap
    * metadata column best predicts the label?): for each candidate
    * feature (source; n_chars÷1000 length bucket) against the `lang`
    * label, IG = H(label) − H(label|feature) plus Quinlan's gain
    * ratio (IG / H(feature) — penalizes high-cardinality features
    * that LOOK predictive by fragmentation). Every probability is a
    * single count division; every entropy is a DECIMAL(38,6)-routed
    * sum of p·ln p terms over label/feature-bounded frames; two
    * fact-sized groupBys per feature. */
  val q342 = {
    def igSqlFor(fexpr: String, fname: String): String =
      s"""SELECT '$fname' AS feature, hl.h_label, hf.h_feature, hc.h_cond,
         |  hl.h_label - hc.h_cond AS ig
         |FROM
         |  (SELECT CAST(SUM(CAST(-(CAST(nl AS DOUBLE) / nn)
         |      * ln(CAST(nl AS DOUBLE) / nn) AS DECIMAL(38,6))) AS DOUBLE)
         |      AS h_label
         |   FROM (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl,
         |           CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS nn
         |         FROM documents GROUP BY lang) t) hl,
         |  (SELECT CAST(SUM(CAST(-(CAST(nf AS DOUBLE) / nn)
         |      * ln(CAST(nf AS DOUBLE) / nn) AS DECIMAL(38,6))) AS DOUBLE)
         |      AS h_feature
         |   FROM (SELECT $fexpr AS f, CAST(COUNT(*) AS BIGINT) AS nf,
         |           CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS nn
         |         FROM documents GROUP BY 1) t) hf,
         |  (SELECT CAST(SUM(CAST((CAST(nf AS DOUBLE) / nn) * hf_inner
         |      AS DECIMAL(38,6))) AS DOUBLE) AS h_cond
         |   FROM (
         |     SELECT f, nf, nn,
         |       CAST(SUM(CAST(-(CAST(nfl AS DOUBLE) / nf)
         |         * ln(CAST(nfl AS DOUBLE) / nf) AS DECIMAL(38,6)))
         |         AS DOUBLE) AS hf_inner
         |     FROM (
         |       SELECT $fexpr AS f, lang,
         |         CAST(COUNT(*) AS BIGINT) AS nfl,
         |         CAST(SUM(COUNT(*)) OVER (PARTITION BY $fexpr) AS BIGINT)
         |           AS nf,
         |         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS nn
         |       FROM documents GROUP BY 1, 2) c
         |     GROUP BY f, nf, nn) pf) hc""".stripMargin

    def igFor(docs: org.apache.spark.sql.DataFrame, f: org.apache.spark.sql.Column,
              fname: String): org.apache.spark.sql.DataFrame = {
      val W = org.apache.spark.sql.expressions.Window
      val base = docs.select(f.as("f"), col("lang"))
      val hl = base.groupBy(col("lang")).agg(lcount(lit(1)).as("nl"))
        .withColumn("nn", sum(col("nl")).over(W.partitionBy()))
        .agg(dsum(-(col("nl").cast("double") / col("nn"))
          * log(col("nl").cast("double") / col("nn"))).as("h_label"))
      val hf = base.groupBy(col("f")).agg(lcount(lit(1)).as("nf"))
        .withColumn("nn", sum(col("nf")).over(W.partitionBy()))
        .agg(dsum(-(col("nf").cast("double") / col("nn"))
          * log(col("nf").cast("double") / col("nn"))).as("h_feature"))
      val hc = base.groupBy(col("f"), col("lang")).agg(lcount(lit(1)).as("nfl"))
        .withColumn("nf", sum(col("nfl")).over(W.partitionBy(col("f"))))
        .withColumn("nn", sum(col("nfl")).over(W.partitionBy()))
        .groupBy(col("f"), col("nf"), col("nn"))
        .agg(dsum(-(col("nfl").cast("double") / col("nf"))
          * log(col("nfl").cast("double") / col("nf"))).as("hf_inner"))
        .agg(dsum((col("nf").cast("double") / col("nn")) * col("hf_inner"))
          .as("h_cond"))
      hl.crossJoin(hf).crossJoin(hc)
        .select(lit(fname).as("feature"), col("h_label"), col("h_feature"),
          col("h_cond"), (col("h_label") - col("h_cond")).as("ig"))
    }

    GQuery(
      "q342_information_gain",
      (s, d) => {
        val docs = documents(s, d)
        igFor(docs, col("source"), "source")
          .unionByName(igFor(docs, expr("n_chars div 1000").cast("long")
            .cast("string"), "len_bucket"))
          .select(col("feature"), round(col("h_label"), 6).as("h_label"),
            round(col("h_feature"), 6).as("h_feature"),
            round(col("h_cond"), 6).as("h_cond"), round(col("ig"), 6).as("ig"),
            round(when(col("h_feature") > 0, col("ig") / col("h_feature")), 6)
              .as("gain_ratio"))
          .orderBy(col("feature"))
      },
      Some(s"""WITH igs AS (
        |${igSqlFor("source", "source")}
        |UNION ALL
        |${igSqlFor("CAST(CAST(n_chars // 1000 AS BIGINT) AS VARCHAR)",
             "len_bucket")}
        |)
        |SELECT feature, round(h_label, 6) AS h_label,
        |  round(h_feature, 6) AS h_feature, round(h_cond, 6) AS h_cond,
        |  round(ig, 6) AS ig,
        |  round(CASE WHEN h_feature > 0 THEN ig / h_feature END, 6)
        |    AS gain_ratio
        |FROM igs ORDER BY feature""".stripMargin))
  }

  /** q349: watermark-detection census (Kirchenbauer et al. 2023) —
    * the provenance scan a crawl pipeline runs to flag LLM-generated
    * text before it contaminates training data: a watermarking
    * sampler biases each token toward a GREEN LIST seeded by the
    * previous token's hash, so detection is a one-proportion z-test
    * per document (g green among T scored tokens vs γ under H₀).
    * Green membership replays the repo's md5-uniform (7 hex / 2²⁸)
    * on the (prev, token) pair, γ = 0.25; docs need T ≥ 10. This
    * corpus is NOT watermarked, so the census certifies the null
    * (mean z ≈ 0, nothing past the z > 4 flag line) — the same
    * numbers a watermarked source would push right. One bigram
    * explode; everything after is per-source. */
  val q349 = GQuery(
    "q349_watermark_census",
    (s, d) => {
      import graft.text.LangModel
      val bg = LangModel.bigramPairs(documents(s, d), "doc_id", "text")
        .withColumn("green", expr(
          """CAST(conv(substring(md5(concat('wm-', w1, '-', w2)), 1, 7),
            |16, 10) AS BIGINT) / 268435456.0 < 0.25""".stripMargin
            .replace("\n", " ")))
      val perDoc = bg.groupBy(col("doc").as("doc_id"))
        .agg(lcount(lit(1)).as("t"),
          coalesce(sum(when(col("green"), 1L)), lit(0L)).as("g"))
        .filter(col("t") >= 10)
        .withColumn("z",
          (col("g").cast("double") - lit(0.25) * col("t").cast("double"))
            / sqrt(col("t").cast("double") * lit(0.25) * lit(0.75)))
      perDoc
        .join(documents(s, d).select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .groupBy(col("source"))
        .agg(lcount(lit(1)).as("n_docs"),
          round(dsum(col("z")) / count(lit(1)), 6).as("mean_z"),
          round(max(col("z")), 6).as("max_z"),
          coalesce(sum(when(col("z") > 4.0, 1L)), lit(0L)).as("n_flagged"))
        .orderBy(col("source"))
    },
    Some(s"""WITH bg AS (
      |  SELECT doc_id AS doc, ws[i] AS w1, ws[i+1] AS w2
      |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)),
      |gr AS (
      |  SELECT doc,
      |    (CAST(('0x' || substr(md5('wm-' || w1 || '-' || w2), 1, 7))
      |      AS BIGINT) / 268435456.0 < 0.25) AS green
      |  FROM bg),
      |per AS (
      |  SELECT doc, CAST(COUNT(*) AS BIGINT) AS t,
      |    COALESCE(CAST(SUM(CASE WHEN green THEN 1 END) AS BIGINT), 0) AS g
      |  FROM gr GROUP BY doc),
      |z AS (
      |  SELECT doc,
      |    (CAST(g AS DOUBLE) - 0.25 * CAST(t AS DOUBLE))
      |      / sqrt(CAST(t AS DOUBLE) * 0.25 * 0.75) AS z
      |  FROM per WHERE t >= 10)
      |SELECT dd.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  round(${sqlDsum("z.z")} / COUNT(*), 6) AS mean_z,
      |  round(MAX(z.z), 6) AS max_z,
      |  COALESCE(CAST(SUM(CASE WHEN z.z > 4.0 THEN 1 END) AS BIGINT), 0)
      |    AS n_flagged
      |FROM z JOIN documents dd ON z.doc = dd.doc_id
      |GROUP BY dd.source ORDER BY dd.source""".stripMargin))

  /** q350: DoReMi-lite domain reweighting (Xie et al. 2023, one
    * exponentiated-gradient step) — the loss-aware upgrade over
    * q104's temperature mixing (temperature only looks at SIZE;
    * DoReMi boosts domains where the proxy model's held-out loss is
    * WORST, i.e. where more data would help most): per language, the
    * bigram-mass-weighted held-out NLL under the q146 proxy model
    * (trained on doc_id % 3 ≠ 0, scored on the % 3 = 0 holdout),
    * excess over the global reference loss, and the new mixture
    * w'_d ∝ w_d·e^(η·excess) (η = 1) against the char-mass baseline.
    * Doc scores ride [[LangModel.score]]'s e9-quantized exact sums;
    * the domain rollups and the normalizer are DECIMAL-routed over
    * the 5-language frame. */
  val q350 = GQuery(
    "q350_doremi_reweight",
    (s, d) => {
      val docs = documents(s, d)
      val model = LangModel.train(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text")
      val scored = LangModel.score(docs.filter(col("doc_id") % 3 === 0),
          model, "doc_id", "text")
        .join(docs.select(col("doc_id").as("doc"), col("lang")), Seq("doc"))
      val byLang = scored.groupBy(col("lang"))
        .agg(sum(col("n_bigrams")).as("mass"),
          dsum(-col("logprob") * col("n_bigrams").cast("double")).as("nllw"))
        .withColumn("loss", col("nllw") / col("mass").cast("double"))
        .localCheckpoint(eager = false) // reference + normalizer probe it
      val ref = byLang.agg(
        (sum(col("nllw").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .cast("double") / sum(col("mass")).cast("double")).as("l_ref"))
      val base = docs.groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("chars"))
      val baseTot = base.agg(sum(col("chars")).as("chars_all"))
      val w = byLang.join(base, Seq("lang"))
        .crossJoin(broadcast(ref)).crossJoin(broadcast(baseTot))
        .withColumn("w0",
          col("chars").cast("double") / col("chars_all").cast("double"))
        .withColumn("excess", greatest(col("loss") - col("l_ref"), lit(0.0)))
        .withColumn("wu", col("w0") * exp(col("excess")))
        .localCheckpoint(eager = false) // normalizer + output probe it
      val norm = w.agg(
        sum(col("wu").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double").as("zsum"))
      w.crossJoin(broadcast(norm))
        .select(col("lang"), col("mass"),
          round(col("loss"), 6).as("loss"),
          round(col("excess"), 6).as("excess"),
          round(col("w0"), 6).as("base_share"),
          round(col("wu") / col("zsum"), 6).as("new_share"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH bg AS (
      |  SELECT doc_id AS doc, ws[i] AS w1, ws[i+1] AS w2
      |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)),
      |cbg AS (
      |  SELECT w1, w2, COUNT(*) AS c2 FROM bg WHERE doc % 3 <> 0
      |  GROUP BY 1, 2),
      |toks AS (
      |  SELECT unnest($wsSql) AS w FROM documents WHERE doc_id % 3 <> 0),
      |cuni AS (SELECT w AS w1, COUNT(*) AS c1 FROM toks GROUP BY 1),
      |voc AS (SELECT COUNT(DISTINCT w) AS v FROM toks),
      |scored AS (
      |  SELECT b.doc, COUNT(*) AS n_bigrams,
      |    (${graft.core.Exact.sqlLsumAt(
           "ln(CAST(COALESCE(g.c2, 0) + 1 AS DOUBLE) / CAST(COALESCE(u.c1, 0) + voc.v AS DOUBLE))",
           "1000000000.0")} / COUNT(*)) AS logprob
      |  FROM bg b
      |  LEFT JOIN cbg g ON b.w1 = g.w1 AND b.w2 = g.w2
      |  LEFT JOIN cuni u ON b.w1 = u.w1
      |  CROSS JOIN voc
      |  WHERE b.doc % 3 = 0
      |  GROUP BY b.doc),
      |byl AS (
      |  SELECT dd.lang, CAST(SUM(s.n_bigrams) AS BIGINT) AS mass,
      |    ${sqlDsum("-s.logprob * CAST(s.n_bigrams AS DOUBLE)")} AS nllw
      |  FROM scored s JOIN documents dd ON s.doc = dd.doc_id
      |  GROUP BY dd.lang),
      |byl2 AS (
      |  SELECT lang, mass, nllw, nllw / CAST(mass AS DOUBLE) AS loss
      |  FROM byl),
      |ref AS (
      |  SELECT CAST(SUM(CAST(nllw AS DECIMAL(38,6))) AS DOUBLE)
      |    / CAST(SUM(mass) AS DOUBLE) AS l_ref
      |  FROM byl2),
      |base AS (
      |  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS chars
      |  FROM documents GROUP BY lang),
      |bt AS (SELECT CAST(SUM(chars) AS BIGINT) AS chars_all FROM base),
      |w AS (
      |  SELECT b2.lang, b2.mass, b2.loss,
      |    GREATEST(b2.loss - r.l_ref, 0.0) AS excess,
      |    CAST(ba.chars AS DOUBLE) / CAST(t.chars_all AS DOUBLE) AS w0,
      |    (CAST(ba.chars AS DOUBLE) / CAST(t.chars_all AS DOUBLE))
      |      * exp(GREATEST(b2.loss - r.l_ref, 0.0)) AS wu
      |  FROM byl2 b2 JOIN base ba ON b2.lang = ba.lang
      |  CROSS JOIN ref r CROSS JOIN bt t),
      |norm AS (
      |  SELECT CAST(SUM(CAST(wu AS DECIMAL(38,18))) AS DOUBLE) AS zsum
      |  FROM w)
      |SELECT w.lang, w.mass, round(w.loss, 6) AS loss,
      |  round(w.excess, 6) AS excess, round(w.w0, 6) AS base_share,
      |  round(w.wu / n.zsum, 6) AS new_share
      |FROM w CROSS JOIN norm n ORDER BY w.lang""".stripMargin))

  /** q364: multinomial naive-Bayes language classifier — the
    * generatively-trained counterpart of the q134 discriminative
    * (hashed-logistic) gate and the q34 heuristic langid: add-one
    * Laplace token likelihoods and doc-count priors are COUNTED (one
    * grouped pass over the doc_id%3≠0 train slice — training is an
    * aggregation, no iterations), and scoring joins the bounded
    * (lang × token) likelihood table onto test tokens with the
    * language grid broadcast (L≈5 langs, so the grid multiplies rows
    * by a constant, never by data). Log terms go through the
    * e9-floored exact-sum discipline (q146) so per-doc scores are
    * partition-independent; argmax ties break lexicographically.
    * Census = the held-out confusion matrix plus a score checksum. */
  /** The q364 naive-Bayes (doc × lang) score grid — factored out and
    * LANDED so the data-centric-AI consumers (q389 confident-learning
    * label errors, q390 uncertainty acquisition) probe the scores
    * instead of re-counting the model. Columns:
    * (doc_id, true_lang, ml, score_e6). */
  private[graft] def nbScoreGridBuild(s: org.apache.spark.sql.SparkSession,
                                      d: String)
      : org.apache.spark.sql.DataFrame = {
    val docs = documents(s, d)
    nbGridFor(docs.filter(col("doc_id") % 3 =!= 0),
      docs.filter(col("doc_id") % 3 === 0))
  }

  /** NB (doc × lang) scores of `score` docs under a model counted from
    * `train` docs — the parametric core behind the landed q364 grid
    * and q400's retrain ablation. Both frames carry
    * (doc_id, lang, text). */
  private[graft] def nbGridFor(train: org.apache.spark.sql.DataFrame,
                               test: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    nbGridTok(train,
      train.select(col("lang"),
        explode(graft.text.TextFunctions.wsTokens(col("text"))).as("w")),
      test,
      test.select(col("doc_id"),
        explode(graft.text.TextFunctions.wsTokens(col("text"))).as("w")))

  /** [[nbGridFor]] over PRE-TOKENIZED frames — `trTok` = (lang, w)
    * with multiplicity for the model slice, `teTok` = (doc_id, w) for
    * the scored slice. Callers that score several model variants over
    * the same corpus (q400's retrain ablation) tokenize once, pin the
    * token frames, and pass slices here instead of re-running the
    * regex tokenizer per chain (guide §1.2: don't recompute what you
    * already have). Same plan below the token frames, so results are
    * bit-identical with [[nbGridFor]]. */
  private[graft] def nbGridTok(train: org.apache.spark.sql.DataFrame,
                               trTok: org.apache.spark.sql.DataFrame,
                               test: org.apache.spark.sql.DataFrame,
                               teTok0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import graft.core.Exact.{lcount, lsumAt}
    val cnt = trTok.groupBy(col("lang"), col("w"))
      .agg(lcount(lit(1)).as("c"))
      .select(col("lang").as("ml"), col("w"), col("c"))
    val tot = cnt.groupBy(col("ml")).agg(sum(col("c")).as("tot"))
    val vocab = trTok.agg(countDistinct(col("w")).cast("long").as("v"))
    val pri = train.groupBy(col("lang"))
      .agg(lcount(lit(1)).as("nl")).select(col("lang").as("ml"), col("nl"))
    val nAll = train.agg(lcount(lit(1)).as("n_all"))
    val teTok = teTok0
    val docLang = teTok
      .crossJoin(broadcast(tot.crossJoin(vocab)))
      // (lang × token) likelihoods are vocabulary-sized — shuffle
      // join on (ml, w), never a broadcast that grows with the corpus
      .join(cnt, Seq("ml", "w"), "left")
      .select(col("doc_id"), col("ml"),
        log((coalesce(col("c"), lit(0L)) + 1).cast("double")
          / (col("tot") + col("v")).cast("double")).as("lp"))
      .groupBy(col("doc_id"), col("ml"))
      .agg(lsumAt(col("lp"), 1e9).as("tok_lp"))
    test.select(col("doc_id"), col("lang").as("true_lang"))
      .crossJoin(broadcast(pri.crossJoin(nAll)))
      .join(docLang, Seq("doc_id", "ml"), "left")
      .select(col("doc_id"), col("true_lang"), col("ml"),
        floor((coalesce(col("tok_lp"), lit(0.0))
          + floor(log(col("nl").cast("double") / col("n_all")) * 1e9
            + 0.5) / 1e9) * 1e6 + 0.5).cast("long").as("score_e6"))
  }

  private[graft] def nbScoreGrid(s: org.apache.spark.sql.SparkSession,
                                 d: String, probe: Boolean) =
    if (probe)
      graft.core.Landed.probeOrBuild(s, s"nb-scores:$d")(nbScoreGridBuild(s, d))
    else
      graft.core.Landed.land(s, s"nb-scores:$d")(nbScoreGridBuild(s, d))

  val q364 = GQuery(
    "q364_naive_bayes_langid",
    (s, d) => {
      import graft.core.Exact.lcount
      val w = org.apache.spark.sql.expressions.Window
      // PRODUCER: lands the score grid for the q389/q390 consumers
      val pred = nbScoreGrid(s, d, probe = false)
        .withColumn("rn", row_number().over(
          w.partitionBy(col("doc_id"))
            .orderBy(col("score_e6").desc, col("ml").asc)))
        .filter(col("rn") === 1)
      pred.groupBy(col("true_lang"), col("ml").as("pred_lang"))
        .agg(lcount(lit(1)).as("n_docs"),
          sum(col("score_e6")).as("score_checksum"))
        .orderBy(col("true_lang"), col("pred_lang"))
    },
    Some(s"""WITH tr AS (
      |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 <> 0),
      |te AS (
      |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 = 0),
      |trtok AS (SELECT lang, unnest($wsSql) AS w FROM tr),
      |cnt AS (
      |  SELECT lang AS ml, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM trtok GROUP BY 1, 2),
      |tot AS (SELECT ml, CAST(SUM(c) AS BIGINT) AS tot FROM cnt GROUP BY ml),
      |voc AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM trtok),
      |pri AS (
      |  SELECT lang AS ml, CAST(COUNT(*) AS BIGINT) AS nl
      |  FROM tr GROUP BY 1),
      |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM tr),
      |tetok AS (SELECT doc_id, unnest($wsSql) AS w FROM te),
      |dl AS (
      |  SELECT t.doc_id, l.ml,
      |    ${graft.core.Exact.sqlLsumAt(
             "ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)" +
               " / CAST(l.tot + voc.v AS DOUBLE))",
             "1000000000.0")} AS tok_lp
      |  FROM tetok t CROSS JOIN tot l CROSS JOIN voc
      |  LEFT JOIN cnt c ON c.ml = l.ml AND c.w = t.w
      |  GROUP BY t.doc_id, l.ml),
      |sc AS (
      |  SELECT g.doc_id, g.true_lang, g.ml,
      |    CAST(floor((COALESCE(d.tok_lp, 0.0)
      |      + floor(ln(CAST(g.nl AS DOUBLE) / g.n_all) * 1e9 + 0.5) / 1e9)
      |      * 1e6 + 0.5) AS BIGINT) AS score_e6
      |  FROM (SELECT te.doc_id, te.lang AS true_lang, p.ml, p.nl, na.n_all
      |        FROM te CROSS JOIN pri p CROSS JOIN na) g
      |  LEFT JOIN dl d ON d.doc_id = g.doc_id AND d.ml = g.ml),
      |pr AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY score_e6 DESC, ml) AS rn FROM sc)
      |SELECT true_lang, ml AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(score_e6) AS BIGINT) AS score_checksum
      |FROM pr WHERE rn = 1
      |GROUP BY true_lang, ml ORDER BY true_lang, ml""".stripMargin))

  /** q375: DPO implicit-reward margin census (Rafailov et al. 2023) —
    * the direct-preference-optimization diagnostic run before any DPO
    * training job: the implicit reward is β·(ln π(y) − ln π_ref(y)),
    * here with the add-one bigram LM as the policy and the Kneser–Ney
    * LM (same train slice, different smoothing) as the reference —
    * the two proxy models this repo already maintains (q146/q224).
    * Preference pairs are adjacent same-language docs with the longer
    * one chosen; per language the census reports the mean margin, the
    * implicit-reward accuracy (share of pairs the policy already
    * orders correctly — the number DPO papers table), and the mean
    * −ln σ(m) loss. Scores e6-floor per doc (q146 discipline), so
    * margins are INTEGER differences — only the loss passes through
    * transcendentals. */
  val q375 = GQuery(
    "q375_dpo_margin",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
      val docs = documents(s, d)
      // r12: ONE tokenizer+n-gram pass over the corpus, pinned at the
      // (doc, w1, w2) grain. Both models count the SAME train-slice
      // bigram census (pinned once — the oracle SQL's shared `cbg`
      // CTE, which the Spark side used to recount), and both scoring
      // passes probe the pinned pair frame. Guide §1.2: was 6
      // tokenizer passes (4 over train, 2 over the full corpus), now
      // 2 (pairs over docs; unigrams over train — doc-final tokens
      // have no bigram, so unigram counts need the raw token frame).
      val bg = LangModel.bigramPairs(docs, "doc_id", "text")
        .localCheckpoint(eager = false)
      val cbg = bg.filter(col("doc") % 3 =!= 0)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
        .localCheckpoint(eager = false)
      val uni = docs.filter(col("doc_id") % 3 =!= 0)
        .select(explode(graft.text.TextFunctions.wsTokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c1"))
        .withColumnRenamed("w", "w1")
        .localCheckpoint(eager = false) // c1 probe + the vocab scalar
      val vocab = uni.agg(count(lit(1)).as("v")) // == countDistinct(toks)
      val pol = LangModel.scorePairs(bg,
          LangModel.BigramModel(cbg, uni, vocab))
        .select(col("doc"), floor(col("logprob") * 1e6 + 0.5).cast("long")
          .as("p_e6"))
      val ref = LangModel.scoreKnPairs(bg,
          LangModel.trainKnCounts(cbg, vocab))
        .select(col("doc"), floor(col("logprob") * 1e6 + 0.5).cast("long")
          .as("r_e6"))
      val scored = pol.join(ref, Seq("doc"))
        .join(docs.select(col("doc_id").as("doc"), col("lang"),
          col("n_chars")), Seq("doc"))
      val lw = w.partitionBy(col("lang")).orderBy(col("doc"))
      val pairs = scored
        .withColumn("doc_b", lead(col("doc"), 1).over(lw))
        .withColumn("p_b", lead(col("p_e6"), 1).over(lw))
        .withColumn("r_b", lead(col("r_e6"), 1).over(lw))
        .withColumn("nc_b", lead(col("n_chars"), 1).over(lw))
        .filter(col("doc_b").isNotNull)
        .withColumn("a_chosen", col("n_chars") >= col("nc_b"))
        .withColumn("margin_e6",
          when(col("a_chosen"),
            (col("p_e6") - col("r_e6")) - (col("p_b") - col("r_b")))
            .otherwise((col("p_b") - col("r_b"))
              - (col("p_e6") - col("r_e6"))))
        .withColumn("m",
          col("margin_e6").cast("double") / 1e6 * 0.1)
      pairs.groupBy(col("lang"))
        .agg(lcount(lit(1)).as("n_pairs"),
          sum(col("margin_e6")).as("sum_margin_e6"),
          coalesce(sum(when(col("margin_e6") > 0, 1L)), lit(0L)).as("n_correct"),
          dsum(log(lit(1.0) + exp(lit(0.0) - col("m")))).as("loss_sum"))
        .select(col("lang"), col("n_pairs"),
          round(col("sum_margin_e6").cast("double") / col("n_pairs") / 1e6
            * 0.1, 6).as("mean_margin"),
          round(col("n_correct").cast("double") / col("n_pairs"), 6)
            .as("acc"),
          round(col("loss_sum") / col("n_pairs"), 6).as("mean_loss"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH bg AS (
      |  SELECT doc_id AS doc, ws[i] AS w1, ws[i+1] AS w2
      |  FROM (SELECT doc_id, $wsSql AS ws FROM documents) t,
      |    UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)),
      |cbg AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
      |  FROM bg WHERE doc % 3 <> 0 GROUP BY 1, 2),
      |toks AS (
      |  SELECT unnest($wsSql) AS w FROM documents WHERE doc_id % 3 <> 0),
      |cuni AS (SELECT w AS w1, CAST(COUNT(*) AS BIGINT) AS c1u
      |  FROM toks GROUP BY 1),
      |voc AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM toks),
      |pol AS (
      |  SELECT b.doc,
      |    CAST(floor((${graft.core.Exact.sqlLsumAt(
             "ln(CAST(COALESCE(g.c2, 0) + 1 AS DOUBLE)" +
               " / CAST(COALESCE(u.c1u, 0) + voc.v AS DOUBLE))",
             "1000000000.0")} / COUNT(*)) * 1e6 + 0.5) AS BIGINT) AS p_e6
      |  FROM bg b
      |  LEFT JOIN cbg g ON b.w1 = g.w1 AND b.w2 = g.w2
      |  LEFT JOIN cuni u ON b.w1 = u.w1
      |  CROSS JOIN voc GROUP BY b.doc),
      |ctx AS (
      |  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
      |    CAST(COUNT(*) AS BIGINT) AS n1p_left
      |  FROM cbg GROUP BY 1),
      |cont AS (
      |  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_right FROM cbg GROUP BY 1),
      |sca AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cbg) AS b,
      |    (SELECT v FROM voc) AS v),
      |ref AS (
      |  SELECT b.doc,
      |    CAST(floor((${graft.core.Exact.sqlLsumAt(
             "ln(CASE WHEN c.c1 IS NOT NULL AND c.c1 > 0 THEN " +
               "(GREATEST(CAST(COALESCE(g.c2, 0) AS DOUBLE) - 0.75, 0.0) " +
               "+ 0.75 * CAST(COALESCE(c.n1p_left, 0) AS DOUBLE) " +
               "* (CAST(COALESCE(r.n1p_right, 0) + 1 AS DOUBLE) " +
               "/ CAST(s.b + s.v AS DOUBLE))) / CAST(c.c1 AS DOUBLE) " +
               "ELSE CAST(COALESCE(r.n1p_right, 0) + 1 AS DOUBLE) " +
               "/ CAST(s.b + s.v AS DOUBLE) END)",
             "1000000000.0")} / COUNT(*)) * 1e6 + 0.5) AS BIGINT) AS r_e6
      |  FROM bg b
      |  LEFT JOIN cbg g ON b.w1 = g.w1 AND b.w2 = g.w2
      |  LEFT JOIN ctx c ON b.w1 = c.w1
      |  LEFT JOIN cont r ON b.w2 = r.w2
      |  CROSS JOIN sca s GROUP BY b.doc),
      |scored AS (
      |  SELECT p.doc, p.p_e6, r.r_e6, dd.lang, dd.n_chars
      |  FROM pol p JOIN ref r ON p.doc = r.doc
      |  JOIN documents dd ON p.doc = dd.doc_id),
      |pw AS (
      |  SELECT lang, doc, p_e6, r_e6, n_chars,
      |    LEAD(doc) OVER (PARTITION BY lang ORDER BY doc) AS doc_b,
      |    LEAD(p_e6) OVER (PARTITION BY lang ORDER BY doc) AS p_b,
      |    LEAD(r_e6) OVER (PARTITION BY lang ORDER BY doc) AS r_b,
      |    LEAD(n_chars) OVER (PARTITION BY lang ORDER BY doc) AS nc_b
      |  FROM scored),
      |pairs AS (
      |  SELECT lang,
      |    CASE WHEN n_chars >= nc_b
      |      THEN (p_e6 - r_e6) - (p_b - r_b)
      |      ELSE (p_b - r_b) - (p_e6 - r_e6) END AS margin_e6
      |  FROM pw WHERE doc_b IS NOT NULL),
      |pm AS (
      |  SELECT lang, margin_e6,
      |    CAST(margin_e6 AS DOUBLE) / 1e6 * 0.1 AS m
      |  FROM pairs)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  round(CAST(SUM(margin_e6) AS DOUBLE) / COUNT(*) / 1e6 * 0.1, 6)
      |    AS mean_margin,
      |  round(CAST(COALESCE(CAST(SUM(CASE WHEN margin_e6 > 0 THEN 1 END)
      |    AS BIGINT), 0) AS DOUBLE) / COUNT(*), 6) AS acc,
      |  round(${sqlDsum("ln(1.0 + exp(0.0 - m))")} / COUNT(*), 6)
      |    AS mean_loss
      |FROM pm GROUP BY lang ORDER BY lang""".stripMargin))

  /** Shared oracle prefix: the q364 NB (doc × lang) score grid as a
    * `grid` CTE (the SQL twin of [[nbScoreGridBuild]]). */
  private def nbGridSql: String = s"""WITH tr AS (
      |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 <> 0),
      |te AS (
      |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 = 0),
      |trtok AS (SELECT lang, unnest($wsSql) AS w FROM tr),
      |cnt AS (
      |  SELECT lang AS ml, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM trtok GROUP BY 1, 2),
      |tot AS (SELECT ml, CAST(SUM(c) AS BIGINT) AS tot FROM cnt GROUP BY ml),
      |voc AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM trtok),
      |pri AS (
      |  SELECT lang AS ml, CAST(COUNT(*) AS BIGINT) AS nl
      |  FROM tr GROUP BY 1),
      |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM tr),
      |tetok AS (SELECT doc_id, unnest($wsSql) AS w FROM te),
      |dl AS (
      |  SELECT t.doc_id, l.ml,
      |    ${graft.core.Exact.sqlLsumAt(
             "ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)" +
               " / CAST(l.tot + voc.v AS DOUBLE))",
             "1000000000.0")} AS tok_lp
      |  FROM tetok t CROSS JOIN tot l CROSS JOIN voc
      |  LEFT JOIN cnt c ON c.ml = l.ml AND c.w = t.w
      |  GROUP BY t.doc_id, l.ml),
      |grid AS (
      |  SELECT g.doc_id, g.true_lang, g.ml,
      |    CAST(floor((COALESCE(d.tok_lp, 0.0)
      |      + floor(ln(CAST(g.nl AS DOUBLE) / g.n_all) * 1e9 + 0.5) / 1e9)
      |      * 1e6 + 0.5) AS BIGINT) AS score_e6
      |  FROM (SELECT te.doc_id, te.lang AS true_lang, p.ml, p.nl, na.n_all
      |        FROM te CROSS JOIN pri p CROSS JOIN na) g
      |  LEFT JOIN dl d ON d.doc_id = g.doc_id AND d.ml = g.ml)"""

  /** q389: confident-learning label-error census (Northcutt et al.
    * 2021) — the data-centric-AI sweep run before trusting labels:
    * normalized NB posteriors (max-shifted softmax over the landed
    * q364 score grid — e6-exact scores in, one exp per cell),
    * per-class confidence thresholds t_j = mean posterior among docs
    * GIVEN label j, and the confident joint counts C[given][suggested]
    * over docs whose posterior clears some class's threshold —
    * off-diagonal mass is the estimated label-error bill. The grid is
    * a landed probe; everything here is L-bounded per doc. */
  val q389 = GQuery(
    "q389_confident_learning",
    (s, d) => {
      import graft.core.Exact.{lcount, dsumOver}
      val w = org.apache.spark.sql.expressions.Window
      val grid = nbScoreGrid(s, d, probe = true)
      val post = grid
        .withColumn("mx", max(col("score_e6")).over(
          w.partitionBy(col("doc_id"))))
        .withColumn("p", exp((col("score_e6") - col("mx")).cast("double")
          / 1e6))
        .withColumn("z", dsumOver(col("p"), w.partitionBy(col("doc_id"))))
        .withColumn("pn", col("p") / col("z"))
      val thr = post.filter(col("ml") === col("true_lang"))
        .groupBy(col("ml"))
        .agg((dsum(col("pn")) / count(lit(1))).as("t"))
      val qual = post.join(broadcast(thr), Seq("ml"))
        .filter(col("pn") >= col("t"))
        .withColumn("rn", row_number().over(
          w.partitionBy(col("doc_id"))
            .orderBy(col("score_e6").desc, col("ml").asc)))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("ml").as("suggested"))
      grid.select(col("doc_id"), col("true_lang")).distinct()
        .join(qual, Seq("doc_id"), "left")
        .groupBy(col("true_lang").as("given"),
          coalesce(col("suggested"), lit("(none)")).as("suggested"))
        .agg(lcount(lit(1)).as("n_docs"))
        .orderBy(col("given"), col("suggested"))
    },
    Some(s"""$nbGridSql,
      |post AS (
      |  SELECT doc_id, true_lang, ml, score_e6,
      |    exp(CAST(score_e6 - MAX(score_e6) OVER (PARTITION BY doc_id)
      |      AS DOUBLE) / 1e6) AS p
      |  FROM grid),
      |post2 AS (
      |  SELECT *, p / CAST(SUM(CAST(p AS DECIMAL(38,6)))
      |    OVER (PARTITION BY doc_id) AS DOUBLE) AS pn
      |  FROM post),
      |thr AS (
      |  SELECT ml, ${sqlDsum("pn")} / COUNT(*) AS t
      |  FROM post2 WHERE ml = true_lang GROUP BY ml),
      |qual AS (
      |  SELECT doc_id, ml AS suggested,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score_e6 DESC, ml ASC) AS rn
      |  FROM (SELECT p2.*, th.t FROM post2 p2
      |        JOIN thr th ON p2.ml = th.ml
      |        WHERE p2.pn >= th.t)),
      |docs1 AS (SELECT DISTINCT doc_id, true_lang FROM grid)
      |SELECT d.true_lang AS given,
      |  COALESCE(q.suggested, '(none)') AS suggested,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM docs1 d LEFT JOIN (SELECT doc_id, suggested FROM qual
      |  WHERE rn = 1) q ON d.doc_id = q.doc_id
      |GROUP BY 1, 2 ORDER BY given, suggested""".stripMargin))

  /** q390: uncertainty-sampling acquisition census — the active-
    * learning batch picker over the same landed grid: per doc the
    * EXACT e6-integer margin between the top two class scores, a
    * 50-doc acquisition batch by (margin asc, doc asc) (bounded heap
    * — never a global sort), and the per-language census of margin
    * mass and batch membership every labeling round reviews. */
  val q390 = GQuery(
    "q390_uncertainty_sampling",
    (s, d) => {
      import graft.core.Exact.lcount
      val w = org.apache.spark.sql.expressions.Window
      val grid = nbScoreGrid(s, d, probe = true)
      val top2 = grid
        .withColumn("rn", row_number().over(
          w.partitionBy(col("doc_id"))
            .orderBy(col("score_e6").desc, col("ml").asc)))
        .filter(col("rn") <= 2)
        .groupBy(col("doc_id"), col("true_lang"))
        .agg((max(when(col("rn") === 1, col("score_e6")))
          - max(when(col("rn") === 2, col("score_e6")))).as("margin_e6"))
      val batch = top2.orderBy(col("margin_e6").asc, col("doc_id").asc)
        .limit(50).select(col("doc_id"), lit(1L).as("sel"))
      top2.join(broadcast(batch), Seq("doc_id"), "left")
        .groupBy(col("true_lang"))
        .agg(lcount(lit(1)).as("n_docs"),
          sum(col("margin_e6")).as("margin_sum_e6"),
          min(col("margin_e6")).as("min_margin_e6"),
          coalesce(sum(col("sel")), lit(0L)).as("n_selected"))
        .select(col("true_lang"), col("n_docs"),
          round(col("margin_sum_e6").cast("double") / col("n_docs") / 1e6, 6)
            .as("mean_margin"),
          col("min_margin_e6"), col("n_selected"))
        .orderBy(col("true_lang"))
    },
    Some(s"""$nbGridSql,
      |top2 AS (
      |  SELECT doc_id, true_lang,
      |    MAX(CASE WHEN rn = 1 THEN score_e6 END)
      |      - MAX(CASE WHEN rn = 2 THEN score_e6 END) AS margin_e6
      |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |          ORDER BY score_e6 DESC, ml ASC) AS rn
      |        FROM grid)
      |  WHERE rn <= 2 GROUP BY doc_id, true_lang),
      |batch AS (
      |  SELECT doc_id, CAST(1 AS BIGINT) AS sel FROM top2
      |  ORDER BY margin_e6 ASC, doc_id ASC LIMIT 50)
      |SELECT t.true_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  round(CAST(SUM(t.margin_e6) AS DOUBLE) / COUNT(*) / 1e6, 6)
      |    AS mean_margin,
      |  MIN(t.margin_e6) AS min_margin_e6,
      |  COALESCE(CAST(SUM(b.sel) AS BIGINT), 0) AS n_selected
      |FROM top2 t LEFT JOIN batch b ON t.doc_id = b.doc_id
      |GROUP BY t.true_lang ORDER BY t.true_lang""".stripMargin))

  /** q396: capture–recapture vocabulary estimate (Lincoln–Petersen +
    * the bias-corrected Chapman 1951 form) — the two-sample member of
    * the coverage-estimation family (q319 Good–Turing asks "how much
    * unseen MASS"; this asks "how many unseen TYPES" from two
    * overlapping samples): two deterministic doc slices are the
    * captures, marked recaptures are the token types seen in both,
    * N̂ = n1·n2/m, Chapman (n1+1)(n2+1)/(m+1)−1; the truth (total
    * distinct types) sits beside the estimates. Three distinct-counts
    * + one intersection semi-join. */
  val q396 = GQuery(
    "q396_capture_recapture",
    (s, d) => {
      val docs = documents(s, d)
      def toks(p: org.apache.spark.sql.Column) = docs.filter(p)
        .select(explode(graft.text.TextFunctions.wsTokens(col("text")))
          .as("w")).distinct()
      val s1 = toks(col("doc_id") % 2 === 0)
      val s2 = toks(col("doc_id") % 3 === 0)
      val n1 = s1.agg(lcount(lit(1)).as("n1"))
      val n2 = s2.agg(lcount(lit(1)).as("n2"))
      val m = s1.join(s2, Seq("w"), "left_semi").agg(lcount(lit(1)).as("m"))
      val truth = toks(lit(true)).agg(lcount(lit(1)).as("true_types"))
      n1.crossJoin(broadcast(n2)).crossJoin(broadcast(m))
        .crossJoin(broadcast(truth))
        .select(col("n1"), col("n2"), col("m"), col("true_types"),
          round(col("n1").cast("double") * col("n2") / col("m"), 3)
            .as("lincoln_petersen"),
          round((col("n1") + 1).cast("double") * (col("n2") + 1)
            / (col("m") + 1) - 1, 3).as("chapman"))
    },
    Some(s"""WITH s1 AS (
      |  SELECT DISTINCT unnest($wsSql) AS w FROM documents
      |  WHERE doc_id % 2 = 0),
      |s2 AS (
      |  SELECT DISTINCT unnest($wsSql) AS w FROM documents
      |  WHERE doc_id % 3 = 0),
      |truth AS (
      |  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS true_types
      |  FROM (SELECT unnest($wsSql) AS w FROM documents)),
      |c AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM s1
      |     WHERE w IN (SELECT w FROM s2)) AS m)
      |SELECT c.n1, c.n2, c.m, t.true_types,
      |  round(CAST(c.n1 AS DOUBLE) * c.n2 / c.m, 3) AS lincoln_petersen,
      |  round(CAST(c.n1 + 1 AS DOUBLE) * (c.n2 + 1) / (c.m + 1) - 1, 3)
      |    AS chapman
      |FROM c CROSS JOIN truth t""".stripMargin))

  /** q397: Chao1 species-richness estimate (Chao 1984) — the
    * abundance-based lower bound on TRUE vocabulary size from the
    * rare-type counts alone (S + f1²/(2f2); singletons/doubletons are
    * exactly the evidence Good–Turing q319 uses for unseen MASS —
    * this is the unseen-TYPES face), with Good's coverage C = 1−f1/N
    * beside it. Per language: one token count pass + one
    * frequency-of-frequency pass. */
  val q397 = GQuery(
    "q397_chao1_richness",
    (s, d) => {
      val freq = documents(s, d)
        .select(col("lang"),
          explode(graft.text.TextFunctions.wsTokens(col("text"))).as("w"))
        .groupBy(col("lang"), col("w")).agg(lcount(lit(1)).as("c"))
      freq.groupBy(col("lang"))
        .agg(lcount(lit(1)).as("s_obs"),
          sum(col("c")).as("n_tokens"),
          coalesce(sum(when(col("c") === 1, 1L)), lit(0L)).as("f1"),
          coalesce(sum(when(col("c") === 2, 1L)), lit(0L)).as("f2"))
        .select(col("lang"), col("s_obs"),
          col("n_tokens").cast("long").as("n_tokens"), col("f1"), col("f2"),
          round(col("s_obs") + when(col("f2") > 0,
            col("f1").cast("double") * col("f1") / (lit(2) * col("f2")))
            .otherwise(col("f1").cast("double") * (col("f1") - 1) / 2), 3)
            .as("chao1"),
          round(lit(1.0) - col("f1").cast("double") / col("n_tokens"), 6)
            .as("coverage"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH freq AS (
      |  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT lang, unnest($wsSql) AS w FROM documents)
      |  GROUP BY lang, w),
      |g AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS s_obs,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    COALESCE(CAST(SUM(CASE WHEN c = 1 THEN 1 END) AS BIGINT), 0)
      |      AS f1,
      |    COALESCE(CAST(SUM(CASE WHEN c = 2 THEN 1 END) AS BIGINT), 0)
      |      AS f2
      |  FROM freq GROUP BY lang)
      |SELECT lang, s_obs, n_tokens, f1, f2,
      |  round(s_obs + CASE WHEN f2 > 0
      |    THEN CAST(f1 AS DOUBLE) * f1 / (2 * f2)
      |    ELSE CAST(f1 AS DOUBLE) * (f1 - 1) / 2 END, 3) AS chao1,
      |  round(1.0 - CAST(f1 AS DOUBLE) / n_tokens, 6) AS coverage
      |FROM g ORDER BY lang""".stripMargin))

  /** Parametric NB oracle chain: scores `$score` docs under a model
    * counted from `$train` (both CTE names providing
    * doc_id/lang/text); emits `${p}grid(doc_id, true_lang, ml,
    * score_e6)` — the SQL twin of [[nbGridFor]]. */
  private def nbCtes(p: String, train: String, score: String): String =
    s"""${p}trtok AS (SELECT lang, unnest($wsSql) AS w FROM $train),
      |${p}cnt AS (
      |  SELECT lang AS ml, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM ${p}trtok GROUP BY 1, 2),
      |${p}tot AS (SELECT ml, CAST(SUM(c) AS BIGINT) AS tot
      |  FROM ${p}cnt GROUP BY ml),
      |${p}voc AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
      |  FROM ${p}trtok),
      |${p}pri AS (
      |  SELECT lang AS ml, CAST(COUNT(*) AS BIGINT) AS nl
      |  FROM $train GROUP BY 1),
      |${p}na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM $train),
      |${p}tetok AS (SELECT doc_id, unnest($wsSql) AS w FROM $score),
      |${p}dl AS (
      |  SELECT t.doc_id, l.ml,
      |    ${graft.core.Exact.sqlLsumAt(
             s"ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)" +
               s" / CAST(l.tot + ${p}voc.v AS DOUBLE))",
             "1000000000.0")} AS tok_lp
      |  FROM ${p}tetok t CROSS JOIN ${p}tot l CROSS JOIN ${p}voc
      |  LEFT JOIN ${p}cnt c ON c.ml = l.ml AND c.w = t.w
      |  GROUP BY t.doc_id, l.ml),
      |${p}grid AS (
      |  SELECT g.doc_id, g.true_lang, g.ml,
      |    CAST(floor((COALESCE(d.tok_lp, 0.0)
      |      + floor(ln(CAST(g.nl AS DOUBLE) / g.n_all) * 1e9 + 0.5) / 1e9)
      |      * 1e6 + 0.5) AS BIGINT) AS score_e6
      |  FROM (SELECT sc.doc_id, sc.lang AS true_lang, p2.ml, p2.nl,
      |          na2.n_all
      |        FROM $score sc CROSS JOIN ${p}pri p2 CROSS JOIN ${p}na na2)
      |        g
      |  LEFT JOIN ${p}dl d ON d.doc_id = g.doc_id AND d.ml = g.ml)"""

  /** q400: confident-learning ablation loop — the full data-centric
    * retrain experiment, not just the error census: (1) score the
    * TRAIN slice in-sample under its own NB model, (2) flag suspects
    * where the q389 confident-learning rule suggests a different
    * label, (3) RETRAIN on the cleaned slice, (4) report held-out
    * accuracy before vs after beside the removal bill. Three
    * parametric NB chains (model→train, model→test, cleaned→test) —
    * training stays a grouped aggregation, so the loop is three
    * passes, not an iterative fit; every chain is replayed by the
    * oracle. (In-sample CL is the documented lite variant; full CL
    * cross-validates the scores.) */
  val q400 = GQuery(
    "q400_label_cleaning_ablation",
    (s, d) => {
      import graft.core.Exact.{lcount, dsumOver}
      val w = org.apache.spark.sql.expressions.Window
      val docs = documents(s, d)
      val train = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"), col("lang"), col("text"))
      val test = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("lang"), col("text"))
      // r11: tokenize each slice ONCE and pin — the three NB chains
      // below (model→train, model→test, cleaned→test) otherwise run
      // the regex tokenizer 6× over the same text (guide §1.2). The
      // cleaned model's tokens are an anti-join on the pinned frame,
      // not a re-tokenization.
      val trTok = train.select(col("doc_id"), col("lang"),
          explode(graft.text.TextFunctions.wsTokens(col("text"))).as("w"))
        .localCheckpoint(eager = false)
      val teTok = test.select(col("doc_id"),
          explode(graft.text.TextFunctions.wsTokens(col("text"))).as("w"))
        .localCheckpoint(eager = false)
      def suspects = {
        val grid = nbGridTok(train, trTok.select(col("lang"), col("w")),
          train, trTok.select(col("doc_id"), col("w")))
        val post = grid
          .withColumn("mx", max(col("score_e6")).over(
            w.partitionBy(col("doc_id"))))
          .withColumn("p", exp((col("score_e6") - col("mx")).cast("double")
            / 1e6))
          .withColumn("z", dsumOver(col("p"), w.partitionBy(col("doc_id"))))
          .withColumn("pn", col("p") / col("z"))
        val thr = post.filter(col("ml") === col("true_lang"))
          .groupBy(col("ml"))
          .agg((dsum(col("pn")) / count(lit(1))).as("t"))
        post.join(broadcast(thr), Seq("ml"))
          .filter(col("pn") >= col("t"))
          .withColumn("rn", row_number().over(
            w.partitionBy(col("doc_id"))
              .orderBy(col("score_e6").desc, col("ml").asc)))
          .filter(col("rn") === 1 && col("ml") =!= col("true_lang"))
          .select(col("doc_id"))
      }
      val susp = suspects.localCheckpoint(eager = false)
      val cleaned = train.join(susp, Seq("doc_id"), "left_anti")
      val clTok = trTok.join(susp, Seq("doc_id"), "left_anti")
      def acc(grid: org.apache.spark.sql.DataFrame) = grid
        .withColumn("rn", row_number().over(
          w.partitionBy(col("doc_id"))
            .orderBy(col("score_e6").desc, col("ml").asc)))
        .filter(col("rn") === 1)
        .agg(lcount(lit(1)).as("n"),
          coalesce(sum(when(col("ml") === col("true_lang"), 1L)), lit(0L))
            .as("ok"))
      val before = acc(nbGridTok(train, trTok.select(col("lang"), col("w")),
        test, teTok))
      val after = acc(nbGridTok(cleaned, clTok.select(col("lang"), col("w")),
        test, teTok))
      val nTr = train.agg(lcount(lit(1)).as("n_train"))
      val nSu = susp.agg(lcount(lit(1)).as("n_suspects"))
      nTr.crossJoin(broadcast(nSu))
        .crossJoin(broadcast(before.select(col("n").as("n_test"),
          col("ok").as("ok_before"))))
        .crossJoin(broadcast(after.select(col("ok").as("ok_after"))))
        .select(col("n_train"), col("n_suspects"), col("n_test"),
          round(col("ok_before").cast("double") / col("n_test"), 6)
            .as("acc_before"),
          round(col("ok_after").cast("double") / col("n_test"), 6)
            .as("acc_after"))
    },
    Some(s"""WITH tr1 AS (
      |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 <> 0),
      |tes AS (
      |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 = 0),
      |${nbCtes("a", "tr1", "tr1")},
      |apost AS (
      |  SELECT doc_id, true_lang, ml, score_e6,
      |    exp(CAST(score_e6 - MAX(score_e6) OVER (PARTITION BY doc_id)
      |      AS DOUBLE) / 1e6) AS p
      |  FROM agrid),
      |apost2 AS (
      |  SELECT *, p / CAST(SUM(CAST(p AS DECIMAL(38,6)))
      |    OVER (PARTITION BY doc_id) AS DOUBLE) AS pn
      |  FROM apost),
      |athr AS (
      |  SELECT ml, ${sqlDsum("pn")} / COUNT(*) AS t
      |  FROM apost2 WHERE ml = true_lang GROUP BY ml),
      |asusp AS (
      |  SELECT doc_id FROM (
      |    SELECT p2.doc_id, p2.ml, p2.true_lang,
      |      row_number() OVER (PARTITION BY p2.doc_id
      |        ORDER BY p2.score_e6 DESC, p2.ml ASC) AS rn
      |    FROM apost2 p2 JOIN athr th ON p2.ml = th.ml
      |    WHERE p2.pn >= th.t)
      |  WHERE rn = 1 AND ml <> true_lang),
      |tr2 AS (
      |  SELECT * FROM tr1
      |  WHERE doc_id NOT IN (SELECT doc_id FROM asusp)),
      |${nbCtes("b", "tr1", "tes")},
      |${nbCtes("c", "tr2", "tes")},
      |accb AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
      |    COALESCE(CAST(SUM(CASE WHEN ml = true_lang THEN 1 END)
      |      AS BIGINT), 0) AS ok_before
      |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |          ORDER BY score_e6 DESC, ml ASC) AS rn FROM bgrid)
      |  WHERE rn = 1),
      |acca AS (
      |  SELECT COALESCE(CAST(SUM(CASE WHEN ml = true_lang THEN 1 END)
      |      AS BIGINT), 0) AS ok_after
      |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |          ORDER BY score_e6 DESC, ml ASC) AS rn FROM cgrid)
      |  WHERE rn = 1)
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tr1) AS n_train,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM asusp) AS n_suspects,
      |  accb.n_test,
      |  round(CAST(accb.ok_before AS DOUBLE) / accb.n_test, 6)
      |    AS acc_before,
      |  round(CAST(acca.ok_after AS DOUBLE) / accb.n_test, 6) AS acc_after
      |FROM accb CROSS JOIN acca""".stripMargin))

  def queries: Seq[GQuery] =
    Seq(q146, q149, q152, q169, q175, q213, q215, q220, q224, q237, q275,
      q276, q314, q319, q325, q331, q333, q342, q349, q350, q364, q375,
      q389, q390, q396, q397, q400)
}
