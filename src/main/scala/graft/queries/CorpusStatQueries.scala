package graft.queries

import org.apache.spark.sql.functions._
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

  def queries: Seq[GQuery] = Seq(q146, q149)
}
