package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.stats.{Agreement, BradleyTerry, Rewards}
import graft.graph.Triangles

/** Preference-data and annotation-quality surface — the post-training
  * side of an LLM data pipeline: fitting strengths from pairwise
  * preferences (reward modeling / arena ranking), checking the
  * annotators who produced them (kappa / alpha), normalizing reward
  * scores into trainer-ready advantages (GRPO), and the link-graph
  * density signal (triangles) curation uses beside PageRank.
  *
  * Every query is exact-arithmetic (integer counts, decimal-routed
  * sums, IEEE scalar ops) so the DuckDB oracles replay the full
  * computation — including every fixed-point iteration of the
  * Bradley–Terry fit — under the hash gate.
  */
object PreferenceQueries {

  private val dsumSql = (x: String) => s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"

  private val BtItems = 12
  private val BtIters = 4

  /** One Bradley–Terry MM round as SQL: p_prev → d_i → r_i → t_i → p_i
    * (mirrors [[graft.stats.BradleyTerry.fit]] op-for-op). */
  private def btIterCte(i: Int): String = {
    val prev = if (i == 1) "p0" else s"p${i - 1}"
    s"""d$i AS (
       |  SELECT s.item, ${dsumSql(s"s.n / (pi.p + pj.p)")} AS den
       |  FROM sym s JOIN $prev pi ON s.item = pi.item
       |             JOIN $prev pj ON s.opp = pj.item
       |  GROUP BY s.item),
       |r$i AS (SELECT w.item, w.w / d.den AS praw
       |        FROM wins w JOIN d$i d ON w.item = d.item),
       |t$i AS (SELECT ${dsumSql("praw")} AS tot FROM r$i),
       |p$i AS (SELECT item, praw / (SELECT tot FROM t$i) AS p FROM r$i)""".stripMargin
  }

  /** q203: Bradley–Terry strengths from a 12-item pairwise tournament
    * ([[graft.stats.BradleyTerry]]) — pairs from lineitem key residues,
    * "a wins" on the quantity coin; 4 MM iterations, every one of them
    * replayed by the oracle's unrolled CTE chain (the q153 PageRank
    * pattern), so the fixed-point dynamics sit under the hash. */
  val q203 = GQuery(
    "q203_bradley_terry",
    (s, d) => {
      val li = lineitem(s, d).select(
        (col("l_suppkey") % BtItems).as("a"),
        (col("l_partkey") % BtItems).as("b"),
        col("l_quantity").as("q"))
        .filter(col("a") < col("b"))
      val pairs = li.groupBy(col("a"), col("b")).agg(
        lcount(when(col("q") > 25, 1)).as("wa"),
        lcount(when(col("q") <= 25, 1)).as("wb"))
      BradleyTerry.fit(pairs, "a", "b", "wa", "wb", iters = BtIters)
        .select(col("item"), col("wins").cast("long").as("wins"),
          col("games").cast("long").as("games"), col("strength"))
    },
    Some(s"""WITH src AS (
      |  SELECT l_suppkey % $BtItems AS a, l_partkey % $BtItems AS b,
      |         l_quantity AS q
      |  FROM lineitem WHERE l_suppkey % $BtItems < l_partkey % $BtItems),
      |pairs AS (
      |  SELECT a, b,
      |    CAST(COUNT(CASE WHEN q > 25 THEN 1 END) AS DOUBLE) AS wa,
      |    CAST(COUNT(CASE WHEN q <= 25 THEN 1 END) AS DOUBLE) AS wb
      |  FROM src GROUP BY a, b),
      |sym AS (SELECT a AS item, b AS opp, wa + wb AS n FROM pairs
      |        UNION ALL
      |        SELECT b AS item, a AS opp, wa + wb AS n FROM pairs),
      |wins AS (SELECT item, ${dsumSql("w")} AS w FROM (
      |    SELECT a AS item, wa AS w FROM pairs
      |    UNION ALL SELECT b AS item, wb AS w FROM pairs) wu
      |  GROUP BY item),
      |games AS (SELECT item, ${dsumSql("n")} AS games FROM sym GROUP BY item),
      |p0 AS (SELECT item,
      |         CAST(1.0 AS DOUBLE) / (SELECT COUNT(*) FROM games) AS p
      |       FROM games),
      |${(1 to BtIters).map(btIterCte).mkString(",\n")}
      |SELECT g.item, CAST(w.w AS BIGINT) AS wins,
      |  CAST(g.games AS BIGINT) AS games, p.p AS strength
      |FROM games g JOIN wins w ON g.item = w.item
      |JOIN p$BtIters p ON g.item = p.item""".stripMargin))

  /** Deterministic "second annotator" drift: cycle the language label
    * one step (en→de→fr→zh→es→en). */
  private def cycleSql(c: String): String =
    s"""CASE $c WHEN 'en' THEN 'de' WHEN 'de' THEN 'fr' WHEN 'fr' THEN 'zh'
       | WHEN 'zh' THEN 'es' ELSE 'en' END""".stripMargin.replace("\n", "")
  private def cycleCol(c: org.apache.spark.sql.Column) =
    when(c === "en", "de").when(c === "de", "fr").when(c === "fr", "zh")
      .when(c === "zh", "es").otherwise("en")

  /** q204: Cohen's kappa between two deterministic raters of the
    * document language ([[graft.stats.Agreement.cohenKappa]]): rater B
    * disagrees on every 5th doc by cycling the label. Pure integer
    * census + three IEEE divisions — chance-corrected agreement under
    * the hash gate. */
  val q204 = GQuery(
    "q204_cohen_kappa",
    (s, d) => {
      val docs = documents(s, d).select(
        col("lang").as("la"),
        when(col("doc_id") % 5 === 0, cycleCol(col("lang")))
          .otherwise(col("lang")).as("lb"))
      Agreement.cohenKappa(docs, "la", "lb")
    },
    Some(s"""WITH labels AS (
      |  SELECT lang AS la,
      |    CASE WHEN doc_id % 5 = 0 THEN ${cycleSql("lang")} ELSE lang END AS lb
      |  FROM documents),
      |cells AS (SELECT la, lb, COUNT(*) AS n FROM labels GROUP BY la, lb),
      |am AS (SELECT la AS l, SUM(n) AS na FROM cells GROUP BY la),
      |bm AS (SELECT lb AS l, SUM(n) AS nb FROM cells GROUP BY lb),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_units,
      |  CAST(SUM(CASE WHEN la = lb THEN n ELSE 0 END) AS BIGINT) AS agree
      |  FROM cells),
      |pe AS (SELECT CAST(SUM(na * nb) AS BIGINT) AS pe_num
      |       FROM am JOIN bm ON am.l = bm.l)
      |SELECT n_units,
      |  CAST(agree AS DOUBLE) / n_units AS p_o,
      |  CAST(pe_num AS DOUBLE) / (n_units * n_units) AS p_e,
      |  (CAST(agree AS DOUBLE) / n_units
      |     - CAST(pe_num AS DOUBLE) / (n_units * n_units))
      |  / (CAST(1.0 AS DOUBLE)
      |     - CAST(pe_num AS DOUBLE) / (n_units * n_units)) AS kappa
      |FROM tot, pe""".stripMargin))

  /** q205: Krippendorff's alpha (nominal) over a 3-rater design
    * ([[graft.stats.Agreement.krippendorffAlpha]]): raters 2 and 3
    * drift on every 5th / every 3rd doc. The coincidence weights
    * 1/(m−1) ride an integer scale (S=2) so the whole computation is
    * int64 until two final divisions. */
  val q205 = GQuery(
    "q205_krippendorff_alpha",
    (s, d) => {
      val docs = documents(s, d)
      val r1 = docs.select(col("doc_id").as("unit"), lit("r1").as("rater"),
        col("lang").as("label"))
      val r2 = docs.select(col("doc_id").as("unit"), lit("r2").as("rater"),
        when(col("doc_id") % 5 === 0, cycleCol(col("lang")))
          .otherwise(col("lang")).as("label"))
      val r3 = docs.select(col("doc_id").as("unit"), lit("r3").as("rater"),
        when(col("doc_id") % 3 === 0, cycleCol(cycleCol(col("lang"))))
          .otherwise(col("lang")).as("label"))
      Agreement.krippendorffAlpha(r1.unionByName(r2).unionByName(r3),
        "unit", "rater", "label", scale = 2L)
    },
    Some(s"""WITH r AS (
      |  SELECT doc_id AS unit, 'r1' AS rater, lang AS label FROM documents
      |  UNION ALL
      |  SELECT doc_id, 'r2',
      |    CASE WHEN doc_id % 5 = 0 THEN ${cycleSql("lang")} ELSE lang END
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 'r3',
      |    CASE WHEN doc_id % 3 = 0 THEN ${cycleSql(cycleSql("lang"))} ELSE lang END
      |  FROM documents),
      |m AS (SELECT unit, COUNT(*) AS m FROM r GROUP BY unit HAVING COUNT(*) > 1),
      |pr AS (
      |  SELECT x.label AS c, y.label AS k, CAST(2 / (m.m - 1) AS BIGINT) AS w
      |  FROM r x JOIN r y ON x.unit = y.unit AND x.rater <> y.rater
      |  JOIN m ON x.unit = m.unit),
      |co AS (SELECT c, k, CAST(SUM(w) AS BIGINT) AS o_ck FROM pr GROUP BY c, k),
      |nc AS (SELECT c, CAST(SUM(o_ck) AS BIGINT) AS n_c FROM co GROUP BY c),
      |tot AS (SELECT CAST(SUM(n_c) AS BIGINT) AS n_s,
      |               CAST(SUM(n_c * n_c) AS BIGINT) AS snc2 FROM nc),
      |dn AS (SELECT CAST(COALESCE(SUM(o_ck), 0) AS BIGINT) AS do_num
      |       FROM co WHERE c <> k)
      |SELECT CAST(FLOOR(CAST(n_s AS DOUBLE) / 2) AS BIGINT) AS n_coincidence,
      |  CAST(do_num AS DOUBLE) / n_s AS d_o,
      |  CAST(n_s * n_s - snc2 AS DOUBLE) / (n_s * (n_s - 2)) AS d_e,
      |  CAST(1.0 AS DOUBLE) -
      |    (CAST(do_num AS DOUBLE) / n_s)
      |      / (CAST(n_s * n_s - snc2 AS DOUBLE) / (n_s * (n_s - 2))) AS alpha
      |FROM dn, tot""".stripMargin))

  /** Link-graph modulus for q206 — prime, small enough that the fixture
    * graph has real triangle structure at sf0.01. */
  private val TriM = 97

  /** q206: triangle counts + local clustering coefficients via
    * degree-ordered orientation ([[graft.graph.Triangles]]) over the
    * synthesized domain link graph (two affine outlinks per doc, the
    * q153 construction). The oracle replays orientation, wedge build
    * and closure probe; counting is exact so lcc hashes bit-for-bit. */
  val q206 = GQuery(
    "q206_triangle_lcc",
    (s, d) => {
      val e = documents(s, d).select(col("doc_id"))
        .select(col("doc_id"), explode(array(
          (col("doc_id") * 7 + 13) % TriM,
          (col("doc_id") * 13 + 29) % TriM)).as("t"))
        .select((col("doc_id") % TriM).as("src"), col("t").as("dst"))
      Triangles.perNode(e, "src", "dst")
    },
    Some(s"""WITH raw AS (
      |  SELECT doc_id % $TriM AS src, t.dst
      |  FROM documents CROSS JOIN LATERAL (
      |    SELECT UNNEST(ARRAY[(doc_id * 7 + 13) % $TriM,
      |                        (doc_id * 13 + 29) % $TriM]) AS dst) t),
      |und AS (
      |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      |  FROM raw WHERE src <> dst),
      |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
      |    SELECT a AS node FROM und UNION ALL SELECT b FROM und)
      |  GROUP BY node),
      |ori AS (
      |  SELECT CASE WHEN da.degree < db.degree
      |              OR (da.degree = db.degree AND u.a < u.b)
      |         THEN u.a ELSE u.b END AS lo,
      |         CASE WHEN da.degree < db.degree
      |              OR (da.degree = db.degree AND u.a < u.b)
      |         THEN u.b ELSE u.a END AS hi
      |  FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node),
      |wedges AS (
      |  SELECT e1.lo AS x, e1.hi AS u, e2.hi AS v
      |  FROM ori e1 JOIN ori e2 ON e1.lo = e2.lo AND e1.hi < e2.hi),
      |tris AS (
      |  SELECT w.x, w.u, w.v FROM wedges w
      |  JOIN ori o ON (o.lo = w.u AND o.hi = w.v)
      |             OR (o.lo = w.v AND o.hi = w.u)),
      |pc AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
      |    SELECT x AS node FROM tris UNION ALL SELECT u FROM tris
      |    UNION ALL SELECT v FROM tris)
      |  GROUP BY node)
      |SELECT d.node, d.degree, COALESCE(pc.triangles, 0) AS triangles,
      |  CASE WHEN d.degree > 1
      |    THEN CAST(2.0 AS DOUBLE) * COALESCE(pc.triangles, 0)
      |         / (d.degree * CAST(d.degree - 1 AS DOUBLE))
      |    ELSE CAST(0.0 AS DOUBLE) END AS lcc
      |FROM deg d LEFT JOIN pc ON d.node = pc.node""".stripMargin))

  /** q207: GRPO group-relative advantage normalization + best-of-n
    * selection ([[graft.stats.Rewards.groupNormalize]]) over the event
    * log read as (prompt=user, candidate=event, reward=value). Exact
    * decimal moments, population variance, zero-variance guard; the
    * best flag's (reward, event_id) argmax is total so membership is
    * replayable. */
  val q207 = GQuery(
    "q207_grpo_advantage",
    (s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        col("value").as("reward"))
      Rewards.groupNormalize(ev, "user_id", "reward", "event_id")
        .select(col("user_id"), col("event_id"), col("reward"),
          col("advantage"), col("best"))
    },
    Some(s"""WITH ev AS (
      |  SELECT user_id, event_id, value AS reward FROM events),
      |m AS (
      |  SELECT user_id, COUNT(*) AS n,
      |    ${dsumSql("reward")} AS s1, ${dsumSql("reward * reward")} AS s2
      |  FROM ev GROUP BY user_id),
      |b AS (
      |  SELECT user_id, event_id AS best_eid FROM (
      |    SELECT user_id, event_id, row_number() OVER (
      |      PARTITION BY user_id ORDER BY reward DESC, event_id DESC) AS rn
      |    FROM ev) br WHERE rn = 1),
      |mm AS (
      |  SELECT m.user_id, b.best_eid, s1 / n AS mean,
      |    sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n),
      |                  CAST(0.0 AS DOUBLE))) AS sd
      |  FROM m JOIN b ON m.user_id = b.user_id)
      |SELECT e.user_id, e.event_id, e.reward,
      |  CASE WHEN mm.sd > 0 THEN (e.reward - mm.mean) / mm.sd
      |       ELSE CAST(0.0 AS DOUBLE) END AS advantage,
      |  e.event_id = mm.best_eid AS best
      |FROM ev e JOIN mm ON e.user_id = mm.user_id""".stripMargin))

  /** q218: Krippendorff's alpha under the ORDINAL and INTERVAL
    * difference metrics ([[graft.stats.Agreement.krippendorffAlphaMetric]])
    * over a 1–5 quality-rating design — the scalar-rating companion
    * of q205's nominal form: three raters score every document,
    * raters 2/3 drift by ±1–2 steps on every 4th/6th doc, and both
    * metrics run off one shared coincidence matrix. Everything is
    * integer (the unified Q quantity: 2S·(c−k) for interval, the
    * scaled cum-marginal difference for ordinal) until one double
    * division per D, so the oracle replays the exact arithmetic. */
  val q218 = GQuery(
    "q218_krippendorff_ordinal",
    (s, d) => {
      val base = (col("doc_id") * 7 + 3) % 5 + 1
      val docs = documents(s, d)
      val r1 = docs.select(col("doc_id").as("unit"), lit("r1").as("rater"),
        base.as("label"))
      val r2 = docs.select(col("doc_id").as("unit"), lit("r2").as("rater"),
        when(col("doc_id") % 4 === 0, least(base + 1, lit(5)))
          .otherwise(base).as("label"))
      val r3 = docs.select(col("doc_id").as("unit"), lit("r3").as("rater"),
        when(col("doc_id") % 6 === 0, greatest(base - 2, lit(1)))
          .otherwise(base).as("label"))
      val ratings = r1.unionByName(r2).unionByName(r3)
      Agreement.krippendorffAlphaMetric(ratings, "unit", "rater", "label",
          scale = 2L, metric = "ordinal")
        .unionByName(Agreement.krippendorffAlphaMetric(ratings,
          "unit", "rater", "label", scale = 2L, metric = "interval"))
    },
    Some("""WITH r AS (
      |  SELECT doc_id AS unit, 'r1' AS rater,
      |    (doc_id * 7 + 3) % 5 + 1 AS label FROM documents
      |  UNION ALL
      |  SELECT doc_id, 'r2',
      |    CASE WHEN doc_id % 4 = 0
      |      THEN LEAST((doc_id * 7 + 3) % 5 + 1 + 1, 5)
      |      ELSE (doc_id * 7 + 3) % 5 + 1 END
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 'r3',
      |    CASE WHEN doc_id % 6 = 0
      |      THEN GREATEST((doc_id * 7 + 3) % 5 + 1 - 2, 1)
      |      ELSE (doc_id * 7 + 3) % 5 + 1 END
      |  FROM documents),
      |m AS (SELECT unit, COUNT(*) AS m FROM r GROUP BY unit HAVING COUNT(*) > 1),
      |pr AS (
      |  SELECT x.label AS c, y.label AS k, CAST(2 / (m.m - 1) AS BIGINT) AS w
      |  FROM r x JOIN r y ON x.unit = y.unit AND x.rater <> y.rater
      |  JOIN m ON x.unit = m.unit),
      |co AS (SELECT c, k, CAST(SUM(w) AS BIGINT) AS o_ck FROM pr GROUP BY c, k),
      |nc AS (SELECT c, CAST(SUM(o_ck) AS BIGINT) AS n_c FROM co GROUP BY c),
      |mg AS (SELECT c, n_c,
      |         SUM(n_c) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS ncum
      |       FROM nc),
      |lp AS (
      |  SELECT a.c AS c, b.c AS k,
      |    (4 * (a.c - b.c)) * (4 * (a.c - b.c)) AS q2_int,
      |    (2 * (b.ncum - a.ncum) + a.n_c - b.n_c)
      |      * (2 * (b.ncum - a.ncum) + a.n_c - b.n_c) AS q2_ord,
      |    a.n_c * b.n_c AS nn
      |  FROM mg a, mg b),
      |tot AS (SELECT CAST(SUM(n_c) AS BIGINT) AS n_s FROM nc),
      |no AS (
      |  SELECT CAST(SUM(co.o_ck * lp.q2_int) AS HUGEINT) AS no_int,
      |         CAST(SUM(co.o_ck * lp.q2_ord) AS HUGEINT) AS no_ord
      |  FROM co JOIN lp ON co.c = lp.c AND co.k = lp.k),
      |ne AS (
      |  SELECT CAST(SUM(nn * q2_int) AS HUGEINT) AS ne_int,
      |         CAST(SUM(nn * q2_ord) AS HUGEINT) AS ne_ord
      |  FROM lp)
      |SELECT 'ordinal' AS metric,
      |  CAST(FLOOR(CAST(n_s AS DOUBLE) / 2) AS BIGINT) AS n_coincidence,
      |  CAST(no_ord AS DOUBLE) / CAST(16 * n_s AS DOUBLE) AS d_o,
      |  CAST(ne_ord AS DOUBLE) / CAST(16 * n_s * (n_s - 2) AS DOUBLE) AS d_e,
      |  1.0 - (CAST(no_ord AS DOUBLE) / CAST(16 * n_s AS DOUBLE))
      |    / (CAST(ne_ord AS DOUBLE) / CAST(16 * n_s * (n_s - 2) AS DOUBLE))
      |    AS alpha
      |FROM no, ne, tot
      |UNION ALL
      |SELECT 'interval',
      |  CAST(FLOOR(CAST(n_s AS DOUBLE) / 2) AS BIGINT),
      |  CAST(no_int AS DOUBLE) / CAST(16 * n_s AS DOUBLE),
      |  CAST(ne_int AS DOUBLE) / CAST(16 * n_s * (n_s - 2) AS DOUBLE),
      |  1.0 - (CAST(no_int AS DOUBLE) / CAST(16 * n_s AS DOUBLE))
      |    / (CAST(ne_int AS DOUBLE) / CAST(16 * n_s * (n_s - 2) AS DOUBLE))
      |FROM no, ne, tot""".stripMargin))

  /** q219: cross-rater quantile normalization
    * ([[graft.stats.QuantileNorm.toPooled]]) — three raters score the
    * same documents with different biases (uniform, squared-compressed,
    * top-half offset); each rater's scores map through their own
    * empirical CDF onto the pooled distribution (rank → (k−0.5)/n →
    * pooled type-7 quantile, exact SortPercentile interpolation
    * arithmetic). Row-level gate: every normalized value must match
    * DuckDB's replay of the windows, the pooled positions, and the
    * interpolation bit-for-bit. */
  val q219 = GQuery(
    "q219_quantile_normalize",
    (s, d) => {
      val mu = (tag: String) =>
        conv(substring(md5(concat(lit(tag),
          col("doc_id").cast("string"))), 1, 7), 16, 10)
          .cast("long") / lit(268435456.0)
      val docs = documents(s, d)
      val ra = docs.select(lit("a").as("rater"), col("doc_id").as("item"),
        mu("qn-a-").as("score"))
      val rb = docs.select(lit("b").as("rater"), col("doc_id").as("item"),
        (mu("qn-b-") * mu("qn-b-")).as("score"))
      val rc = docs.select(lit("c").as("rater"), col("doc_id").as("item"),
        (lit(0.5) + mu("qn-c-") / 2).as("score"))
      graft.stats.QuantileNorm.toPooled(
        ra.unionByName(rb).unionByName(rc), "rater", "item", "score")
    },
    Some("""WITH sc AS (
      |  SELECT 'a' AS rater, doc_id AS item,
      |    CAST(('0x' || substr(md5('qn-a-' || CAST(doc_id AS VARCHAR)), 1, 7))
      |      AS BIGINT) / 268435456.0 AS score
      |  FROM documents
      |  UNION ALL
      |  SELECT 'b', doc_id,
      |    (CAST(('0x' || substr(md5('qn-b-' || CAST(doc_id AS VARCHAR)), 1, 7))
      |      AS BIGINT) / 268435456.0)
      |    * (CAST(('0x' || substr(md5('qn-b-' || CAST(doc_id AS VARCHAR)), 1, 7))
      |      AS BIGINT) / 268435456.0)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'c', doc_id,
      |    0.5 + CAST(('0x' || substr(md5('qn-c-' || CAST(doc_id AS VARCHAR)), 1, 7))
      |      AS BIGINT) / 268435456.0 / 2
      |  FROM documents),
      |rk AS (
      |  SELECT rater, item, score,
      |    row_number() OVER (PARTITION BY rater ORDER BY score, item) AS k,
      |    COUNT(*) OVER (PARTITION BY rater) AS n
      |  FROM sc),
      |t AS (SELECT COUNT(*) AS nn FROM sc),
      |x AS (
      |  SELECT rk.rater, rk.item, rk.score,
      |    (CAST(k AS DOUBLE) - 0.5) / n * (t.nn - 1) AS pos
      |  FROM rk, t),
      |pl AS (
      |  SELECT score AS v,
      |    row_number() OVER (ORDER BY score, rater, item) - 1 AS p
      |  FROM sc)
      |SELECT x.rater, x.item, x.score,
      |  CASE WHEN CAST(CEIL(x.pos) AS BIGINT) = CAST(FLOOR(x.pos) AS BIGINT)
      |         OR hi.v IS NULL THEN lo.v
      |       ELSE (CEIL(x.pos) - x.pos) * lo.v
      |          + (x.pos - FLOOR(x.pos)) * hi.v END AS normalized
      |FROM x JOIN pl lo ON CAST(FLOOR(x.pos) AS BIGINT) = lo.p
      |LEFT JOIN pl hi ON CAST(CEIL(x.pos) AS BIGINT) = hi.p""".stripMargin))

  /** q240: preference-cycle audit — the intransitivity census a
    * Bradley–Terry fit (q203) silently averages away: on the
    * majority-preference tournament (edge a→b when a beats b more
    * often; ties drop), every triangle is either TRANSITIVE (a linear
    * order on 3 items) or CYCLIC (a > b > c > a — annotation noise or
    * genuine non-transitivity, either way the thing to measure before
    * trusting scalar strengths). Cyclic iff every node has outdegree 1.
    * Scale shape: the corpus-sized work is ONE pair aggregation; the
    * triad enumeration runs on the bounded majority-edge frame
    * (items², not comparisons) via ordered wedge joins — the q206
    * discipline. */
  val q240 = {
    val items = 40
    GQuery(
      "q240_preference_cycles",
      (s, d) => {
        val li = lineitem(s, d).select(
          (col("l_suppkey") % items).as("a"),
          (col("l_partkey") % items).as("b"),
          col("l_quantity").as("q"))
          .filter(col("a") < col("b"))
        val pairs = li.groupBy(col("a"), col("b")).agg(
          lcount(when(col("q") > 25, 1)).as("wa"),
          lcount(when(col("q") <= 25, 1)).as("wb"))
        val edges = pairs
          .withColumn("dir",
            when(col("wa") > col("wb"), lit(1))
              .when(col("wb") > col("wa"), lit(-1)))
          .localCheckpoint(eager = false) // three triad lookups below
        val e = edges.filter(col("dir").isNotNull)
        val tri = e.select(col("a"), col("b").as("x"), col("dir").as("d_ab"))
          .join(e.select(col("a"), col("b").as("y"), col("dir").as("d_ac")),
            Seq("a"))
          .filter(col("x") < col("y"))
          .join(e.select(col("a").as("x"), col("b").as("y"),
            col("dir").as("d_bc")), Seq("x", "y"))
        val outA = (col("d_ab") === 1).cast("int") + (col("d_ac") === 1).cast("int")
        val outB = (col("d_ab") === -1).cast("int") + (col("d_bc") === 1).cast("int")
        val outC = (col("d_ac") === -1).cast("int") + (col("d_bc") === -1).cast("int")
        val cyclic = outA === 1 && outB === 1 && outC === 1
        val triCensus = tri.agg(
          lcount(lit(1)).as("n_triads"),
          sum(when(cyclic, lit(1L)).otherwise(lit(0L))).as("n_cyclic"))
        edges.agg(
            lcount(when(col("dir").isNotNull, 1)).as("n_edges"),
            lcount(when(col("dir").isNull, 1)).as("n_ties"))
          .crossJoin(triCensus)
          .select(col("n_edges"), col("n_ties"), col("n_triads"),
            col("n_cyclic"),
            floor(col("n_cyclic").cast("double") /
              col("n_triads").cast("double") * 1e6 + 0.5).cast("long")
              .as("cyclic_rate_e6"))
      },
      Some(s"""WITH src AS (
        |  SELECT l_suppkey % $items AS a, l_partkey % $items AS b,
        |         l_quantity AS q
        |  FROM lineitem WHERE l_suppkey % $items < l_partkey % $items),
        |pairs AS (
        |  SELECT a, b,
        |    COUNT(CASE WHEN q > 25 THEN 1 END) AS wa,
        |    COUNT(CASE WHEN q <= 25 THEN 1 END) AS wb
        |  FROM src GROUP BY a, b),
        |edges AS (
        |  SELECT a, b, CASE WHEN wa > wb THEN 1
        |                    WHEN wb > wa THEN -1 END AS dir
        |  FROM pairs),
        |e AS (SELECT * FROM edges WHERE dir IS NOT NULL),
        |tri AS (
        |  SELECT ab.a, ab.b AS x, ac.b AS y,
        |    ab.dir AS d_ab, ac.dir AS d_ac, bc.dir AS d_bc
        |  FROM e ab
        |  JOIN e ac ON ab.a = ac.a AND ab.b < ac.b
        |  JOIN e bc ON bc.a = ab.b AND bc.b = ac.b),
        |cls AS (
        |  SELECT *,
        |    (CASE WHEN d_ab = 1 THEN 1 ELSE 0 END
        |      + CASE WHEN d_ac = 1 THEN 1 ELSE 0 END) AS out_a,
        |    (CASE WHEN d_ab = -1 THEN 1 ELSE 0 END
        |      + CASE WHEN d_bc = 1 THEN 1 ELSE 0 END) AS out_b,
        |    (CASE WHEN d_ac = -1 THEN 1 ELSE 0 END
        |      + CASE WHEN d_bc = -1 THEN 1 ELSE 0 END) AS out_c
        |  FROM tri),
        |tc AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triads,
        |    CAST(SUM(CASE WHEN out_a = 1 AND out_b = 1 AND out_c = 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_cyclic
        |  FROM cls),
        |ec AS (
        |  SELECT CAST(COUNT(CASE WHEN dir IS NOT NULL THEN 1 END) AS BIGINT)
        |    AS n_edges,
        |    CAST(COUNT(CASE WHEN dir IS NULL THEN 1 END) AS BIGINT) AS n_ties
        |  FROM edges)
        |SELECT ec.n_edges, ec.n_ties, tc.n_triads, tc.n_cyclic,
        |  CAST(floor(CAST(tc.n_cyclic AS DOUBLE) / CAST(tc.n_triads AS DOUBLE)
        |    * 1e6 + 0.5) AS BIGINT) AS cyclic_rate_e6
        |FROM ec, tc""".stripMargin))
  }

  /** q290: pass@k census (Chen et al. 2021, the HumanEval estimator) —
    * the eval-set companion to q207's GRPO advantages: per task with n
    * sampled attempts and c successes, the unbiased
    * pass@k = 1 − C(n−c,k)/C(n,k). pass@1 = c/n stays EXACT (e6,
    * truncating ÷); for k ∈ {5, 10} the binomial ratio telescopes to a
    * FIXED-LENGTH product Π_{i<k}(n−c−i)/(n−i), written as the same
    * explicitly-unrolled IEEE expression on both engines (raw
    * factorial-style integers would pass 10³⁸ at real n) and rounded
    * to 6. One aggregation at the task grain; tasks are domain-bounded
    * (the eval suite), attempts are the scan. */
  val q290 = GQuery(
    "q290_pass_at_k",
    (s, d) => {
      val att = lineitem(s, d).select(
        (col("l_orderkey") % 500).as("task"),
        (floor(col("l_quantity") * 100 + 0.5).cast("long") % 7 === 0).as("ok"))
      def term(i: Int, k: Int): String =
        s"(CAST(n - c - $i AS DOUBLE) / CAST(n - $i AS DOUBLE))"
      def passK(k: Int): String =
        s"""CASE WHEN n >= $k THEN round(CASE WHEN c >= n - $k + 1 THEN 1.0
           |  ELSE 1.0 - ${(0 until k).map(term(_, k)).mkString(" * ")} END, 6)
           |END""".stripMargin
      att.groupBy(col("task"))
        .agg(lcount(lit(1)).as("n"),
          coalesce(sum(when(col("ok"), 1L)), lit(0L)).as("c"))
        .select(col("task"), col("n"), col("c"),
          expr("(c * 1000000) div n").as("pass1_e6"),
          expr(passK(5)).as("pass_at_5"),
          expr(passK(10)).as("pass_at_10"))
        .orderBy(col("task"))
    },
    Some {
      def term(i: Int): String =
        s"(CAST(n - c - $i AS DOUBLE) / CAST(n - $i AS DOUBLE))"
      def passK(k: Int): String =
        s"""CASE WHEN n >= $k THEN round(CASE WHEN c >= n - $k + 1 THEN 1.0
           |  ELSE 1.0 - ${(0 until k).map(term).mkString(" * ")} END, 6)
           |END""".stripMargin
      s"""WITH att AS (
      |  SELECT l_orderkey % 500 AS task,
      |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) % 7 = 0 AS ok
      |  FROM lineitem),
      |g AS (
      |  SELECT task, CAST(COUNT(*) AS BIGINT) AS n,
      |    COALESCE(CAST(SUM(CASE WHEN ok THEN 1 END) AS BIGINT), 0) AS c
      |  FROM att GROUP BY task)
      |SELECT task, n, c, (c * 1000000) // n AS pass1_e6,
      |  ${passK(5)} AS pass_at_5,
      |  ${passK(10)} AS pass_at_10
      |FROM g ORDER BY task""".stripMargin
    })

  /** q304: majority-vote self-consistency eval (Wang et al. 2022) —
    * the k-sample aggregation beside q290's pass@k: where pass@k asks
    * "did ANY attempt succeed", self-consistency asks "does the VOTE
    * of all attempts beat a single attempt". Same task/attempt fixture
    * as q290 with a categorical sampled answer (quantity-derived,
    * mod 5) against a task-derived reference; the majority answer is a
    * per-task frequency argmax with a deterministic tie-break
    * (highest count, then smallest answer — one k-bounded window over
    * the |answers|-bounded count frame), and both accuracies ship as
    * exact integers/ppm. Scale shape: attempts fold map-side into the
    * (task × answer) frame; the vote window partitions by task. */
  val q304 = GQuery(
    "q304_majority_vote",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val att = lineitem(s, d).select(
        (col("l_orderkey") % 500).as("task"),
        (floor(col("l_quantity") * 100 + 0.5).cast("long") % 5).as("ans"))
        .withColumn("ref_ans", col("task") % 5)
      val per = att.groupBy(col("task"), col("ref_ans"))
        .agg(lcount(lit(1)).as("n_attempts"),
          coalesce(sum(when(col("ans") === col("ref_ans"), 1L)), lit(0L))
            .as("n_correct_attempts"))
      val maj = att.groupBy(col("task"), col("ans"))
        .agg(lcount(lit(1)).as("n_votes"))
        .withColumn("rn", row_number().over(
          W.partitionBy(col("task"))
            .orderBy(col("n_votes").desc, col("ans"))))
        .filter(col("rn") === 1)
        .select(col("task"), col("ans").as("maj_ans"), col("n_votes").as("n_maj"))
      per.join(maj, Seq("task"))
        .select(col("task"), col("n_attempts"), col("ref_ans"),
          col("maj_ans"), col("n_maj"),
          (col("maj_ans") === col("ref_ans")).as("maj_correct"),
          expr("(n_correct_attempts * 1000000) div n_attempts")
            .as("single_acc_e6"))
        .orderBy(col("task"))
    },
    Some("""WITH att AS (
      |  SELECT l_orderkey % 500 AS task,
      |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) % 5 AS ans,
      |    (l_orderkey % 500) % 5 AS ref_ans
      |  FROM lineitem),
      |per AS (
      |  SELECT task, ref_ans, CAST(COUNT(*) AS BIGINT) AS n_attempts,
      |    COALESCE(CAST(SUM(CASE WHEN ans = ref_ans THEN 1 END) AS BIGINT), 0)
      |      AS n_correct_attempts
      |  FROM att GROUP BY task, ref_ans),
      |votes AS (
      |  SELECT task, ans, CAST(COUNT(*) AS BIGINT) AS n_votes
      |  FROM att GROUP BY task, ans),
      |maj AS (
      |  SELECT task, ans AS maj_ans, n_votes AS n_maj FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY task
      |      ORDER BY n_votes DESC, ans) AS rn
      |    FROM votes)
      |  WHERE rn = 1)
      |SELECT p.task, p.n_attempts, p.ref_ans, m.maj_ans, m.n_maj,
      |  m.maj_ans = p.ref_ans AS maj_correct,
      |  (p.n_correct_attempts * 1000000) // p.n_attempts AS single_acc_e6
      |FROM per p JOIN maj m ON p.task = m.task
      |ORDER BY p.task""".stripMargin))

  /** q372: rank-2 ALS matrix factorization, one full alternating sweep
    * (Koren/Hu et al. 2008 shape) — THE canonical distributed
    * recommender workload, here in its exactly-reproducible closed
    * form: ratings = per-(user, item) mean event value (items =
    * event_id % 32 — a bounded catalog), item factors initialized
    * deterministically, then (1) every user's 2×2 ridge system
    * (λ=0.1) solved by Cramer's rule from decimal-routed factor
    * moments — the item side BROADCASTS (bounded catalog), the
    * user-solve is one grouped pass; (2) every item's system solved
    * symmetrically — the user-factor side is fact-keyed, so this join
    * SHUFFLES on user_id (the real ALS shuffle at 100 TB); (3) a
    * residual pass reports per-item RMSE under the updated factors.
    * Every arithmetic chain is one IEEE expression both engines spell
    * identically. */
  /** The q372 ALS chain through the item solve — factored out so the
    * item-factor table can LAND (the q214/q231 stage-artifact seam)
    * and the q382 fold-in arm can probe it instead of re-running the
    * sweep. */
  private[graft] def alsRatings(s: org.apache.spark.sql.SparkSession,
                                d: String) =
    events(s, d)
      .groupBy(col("user_id").as("u"), (col("event_id") % 32).as("it"))
      .agg((dsum(col("value")) / count(lit(1))).as("r"))

  private[graft] def alsUserSolve(ratings: org.apache.spark.sql.DataFrame,
                                  q: org.apache.spark.sql.DataFrame,
                                  q1c: String, q2c: String) = {
    val lam = lit(0.1)
    ratings.join(broadcast(q), Seq("it"))
      .groupBy(col("u"))
      .agg(dsum(col(q1c) * col(q1c)).as("a11"),
        dsum(col(q1c) * col(q2c)).as("a12"),
        dsum(col(q2c) * col(q2c)).as("a22"),
        dsum(col("r") * col(q1c)).as("b1"),
        dsum(col("r") * col(q2c)).as("b2"))
      .withColumn("det", (col("a11") + lam) * (col("a22") + lam)
        - col("a12") * col("a12"))
      .select(col("u"),
        ((col("b1") * (col("a22") + lam) - col("b2") * col("a12"))
          / col("det")).as("p1"),
        ((col("b2") * (col("a11") + lam) - col("b1") * col("a12"))
          / col("det")).as("p2"))
  }

  private[graft] def alsItemFactorsBuild(s: org.apache.spark.sql.SparkSession,
                                         d: String)
      : org.apache.spark.sql.DataFrame = {
    val lam = lit(0.1)
    val ratings = alsRatings(s, d)
    val q0 = ratings.select(col("it")).distinct()
      .select(col("it"), (lit(1.0) + log(col("it") + 2) / 10).as("q1"),
        (lit(0.5) + log(col("it") * 2 + 3) / 10).as("q2"))
    val userSolve = alsUserSolve(ratings, q0, "q1", "q2")
    ratings.join(userSolve, Seq("u"))
      .groupBy(col("it"))
      .agg(lcount(lit(1)).as("n"),
        dsum(col("p1") * col("p1")).as("c11"),
        dsum(col("p1") * col("p2")).as("c12"),
        dsum(col("p2") * col("p2")).as("c22"),
        dsum(col("r") * col("p1")).as("d1"),
        dsum(col("r") * col("p2")).as("d2"))
      .withColumn("det", (col("c11") + lam) * (col("c22") + lam)
        - col("c12") * col("c12"))
      .select(col("it"), col("n"),
        ((col("d1") * (col("c22") + lam) - col("d2") * col("c12"))
          / col("det")).as("nq1"),
        ((col("d2") * (col("c11") + lam) - col("d1") * col("c12"))
          / col("det")).as("nq2"))
  }

  /** Landed (it, n, nq1, nq2) item factors after one full sweep. */
  private def alsItemFactors(s: org.apache.spark.sql.SparkSession, d: String,
                             probe: Boolean) =
    if (probe)
      graft.core.Landed.probeOrBuild(s, s"als-item-factors:$d")(
        alsItemFactorsBuild(s, d))
    else
      graft.core.Landed.land(s, s"als-item-factors:$d")(
        alsItemFactorsBuild(s, d))

  val q372 = GQuery(
    "q372_als_factorization",
    (s, d) => {
      val ratings = alsRatings(s, d)
      // ln-based init: high-entropy doubles keep every downstream
      // product off the DECIMAL(38,6) half-boundary (dyadic-clean init
      // times 2-decimal ratings lands exactly on cast boundaries,
      // where the engines' double->decimal roundings can disagree)
      val q0 = ratings.select(col("it")).distinct()
        .select(col("it"), (lit(1.0) + log(col("it") + 2) / 10).as("q1"),
          (lit(0.5) + log(col("it") * 2 + 3) / 10).as("q2"))
      val userSolve = alsUserSolve(ratings, q0, "q1", "q2")
      // PRODUCER: lands the post-sweep item factors for q382's fold-in
      val itemSolve = alsItemFactors(s, d, probe = false)
      // residuals e6-floor BEFORE squaring: sse becomes exact integer
      // arithmetic, so last-ULP drift in the factor chains cannot move
      // the 6th rmse decimal across a rounding boundary (the repo-wide
      // e6-floor parity discipline)
      ratings.join(userSolve, Seq("u"))
        .join(broadcast(itemSolve), Seq("it"))
        .withColumn("e_e6", floor((col("r")
          - (col("p1") * col("nq1") + col("p2") * col("nq2"))) * 1e6 + 0.5)
          .cast("long"))
        .groupBy(col("it"), col("n"), col("nq1"), col("nq2"))
        .agg(sum((col("e_e6") * col("e_e6"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("sse"))
        .select(col("it"), col("n"),
          round(col("nq1"), 6).as("q1"), round(col("nq2"), 6).as("q2"),
          round(sqrt(col("sse").cast("double") / 1e12 / col("n")), 6)
            .as("rmse"))
        .orderBy(col("it"))
    },
    Some(s"""WITH ratings AS (
      |  SELECT user_id AS u, event_id % 32 AS it,
      |    ${sqlDsum("value")} / COUNT(*) AS r
      |  FROM events GROUP BY 1, 2),
      |q0 AS (
      |  SELECT it, 1.0 + ln(it + 2) / 10 AS q1,
      |    0.5 + ln(it * 2 + 3) / 10 AS q2
      |  FROM (SELECT DISTINCT it FROM ratings)),
      |us AS (
      |  SELECT u, ${sqlDsum("q1 * q1")} AS a11, ${sqlDsum("q1 * q2")} AS a12,
      |    ${sqlDsum("q2 * q2")} AS a22, ${sqlDsum("r * q1")} AS b1,
      |    ${sqlDsum("r * q2")} AS b2
      |  FROM ratings JOIN q0 USING (it) GROUP BY u),
      |p AS (
      |  SELECT u,
      |    (b1 * (a22 + 0.1) - b2 * a12)
      |      / ((a11 + 0.1) * (a22 + 0.1) - a12 * a12) AS p1,
      |    (b2 * (a11 + 0.1) - b1 * a12)
      |      / ((a11 + 0.1) * (a22 + 0.1) - a12 * a12) AS p2
      |  FROM us),
      |isv AS (
      |  SELECT it, CAST(COUNT(*) AS BIGINT) AS n,
      |    ${sqlDsum("p1 * p1")} AS c11, ${sqlDsum("p1 * p2")} AS c12,
      |    ${sqlDsum("p2 * p2")} AS c22, ${sqlDsum("r * p1")} AS d1,
      |    ${sqlDsum("r * p2")} AS d2
      |  FROM ratings JOIN p USING (u) GROUP BY it),
      |qn AS (
      |  SELECT it, n,
      |    (d1 * (c22 + 0.1) - d2 * c12)
      |      / ((c11 + 0.1) * (c22 + 0.1) - c12 * c12) AS nq1,
      |    (d2 * (c11 + 0.1) - d1 * c12)
      |      / ((c11 + 0.1) * (c22 + 0.1) - c12 * c12) AS nq2
      |  FROM isv)
      |SELECT r.it, q.n, round(q.nq1, 6) AS q1, round(q.nq2, 6) AS q2,
      |  round(sqrt(CAST(SUM(CAST(
      |      CAST(floor((r.r - (p.p1 * q.nq1 + p.p2 * q.nq2)) * 1e6 + 0.5)
      |        AS BIGINT)
      |      * CAST(floor((r.r - (p.p1 * q.nq1 + p.p2 * q.nq2)) * 1e6 + 0.5)
      |        AS BIGINT) AS HUGEINT)) AS DOUBLE) / 1e12 / q.n), 6)
      |    AS rmse
      |FROM ratings r JOIN p USING (u) JOIN qn q USING (it)
      |GROUP BY r.it, q.n, q.nq1, q.nq2
      |ORDER BY r.it""".stripMargin))

  /** q377: best-of-n expected-reward scaling curve — the
    * inference-compute economics behind BoN sampling / rejection
    * sampling (and the continuous-reward generalization of q290's
    * pass@k): for each prompt group (user) with N scored samples,
    * E[max of a uniform n-subset] has the EXACT order-statistics form
    * Σᵢ r₍ᵢ₎·C(i−1,n−1)/C(N,n), which reduces to
    * (Σᵢ r₍ᵢ₎·Π_{j<n}(i−j))·n / Π_{j<n}(N−j) — pure integer
    * combinatorics once rewards are e2-scaled, so the whole curve is
    * computed in DECIMAL(38,0) (the rank products pass int64 at
    * N≈1500) with ONE double cast per (prompt, n). All four n arms
    * {1,2,4,8} ride a single ranked pass (one window + one grouped
    * aggregation); the census is the per-n mean curve every
    * "scaling laws for reward" plot shows. */
  val q377 = GQuery(
    "q377_best_of_n_curve",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("r_e2"), col("event_id"))
      val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
      val ranked = events(s, d)
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("r_e2"))
        .withColumn("i", row_number().over(w).cast("long"))
      def prod(n: Int, base: String) =
        (1 until n).map(j => col(base) - j)
          .foldLeft(lit(1).cast(dec0): org.apache.spark.sql.Column)(_ * _)
      val perUser = ranked.groupBy(col("user_id"))
        .agg(lcount(lit(1)).as("nn"),
          sum(col("r_e2").cast(dec0)).as("num1"),
          sum(col("r_e2").cast(dec0) * prod(2, "i")).as("num2"),
          sum(col("r_e2").cast(dec0) * prod(4, "i")).as("num4"),
          sum(col("r_e2").cast(dec0) * prod(8, "i")).as("num8"))
      def eN(n: Int) =
        (col(s"num$n") * n).cast("double") /
          prod(n + 1, "nn0").cast("double") / 100
      val wide = perUser.withColumn("nn0", col("nn") + 1)
        // nn0 = N+1 so prod(n+1, nn0) = Π_{j=1..n}(N+1−j) = Π_{j=0..n−1}(N−j)
        .select(col("user_id"), col("nn"),
          eN(1).as("e1"), eN(2).as("e2"), eN(4).as("e4"), eN(8).as("e8"))
      wide.selectExpr("nn",
          "stack(4, 1L, e1, 2L, e2, 4L, e4, 8L, e8) AS (n, e)")
        .filter(col("nn") >= col("n"))
        .groupBy(col("n"))
        .agg(lcount(lit(1)).as("n_prompts"),
          (dsum(col("e")) / count(lit(1))).as("me"))
        .select(col("n"), col("n_prompts"), round(col("me"), 6)
          .as("mean_best_of_n"))
        .orderBy(col("n"))
    },
    Some {
      def prodSql(n: Int, base: String) =
        if (n <= 1) "CAST(1 AS HUGEINT)"
        else (1 until n).map(j => s"($base - $j)")
          .mkString("CAST(1 AS HUGEINT) * ", " * ", "")
      def eSql(n: Int) =
        s"""CAST(num$n * $n AS DOUBLE)
           | / CAST(${prodSql(n + 1, "nn0")} AS DOUBLE) / 100""".stripMargin
          .replace("\n", "")
      s"""WITH ranked AS (
      |  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS r_e2,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT), event_id)
      |      AS BIGINT) AS i
      |  FROM events),
      |pu AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS nn,
      |    SUM(CAST(r_e2 AS HUGEINT)) AS num1,
      |    SUM(CAST(r_e2 AS HUGEINT) * ${prodSql(2, "i")}) AS num2,
      |    SUM(CAST(r_e2 AS HUGEINT) * ${prodSql(4, "i")}) AS num4,
      |    SUM(CAST(r_e2 AS HUGEINT) * ${prodSql(8, "i")}) AS num8
      |  FROM ranked GROUP BY user_id),
      |wide AS (
      |  SELECT user_id, nn, nn + 1 AS nn0, num1, num2, num4, num8
      |  FROM pu),
      |st AS (
      |  SELECT nn, 1 AS n, ${eSql(1)} AS e FROM wide
      |  UNION ALL SELECT nn, 2, ${eSql(2)} FROM wide
      |  UNION ALL SELECT nn, 4, ${eSql(4)} FROM wide
      |  UNION ALL SELECT nn, 8, ${eSql(8)} FROM wide)
      |SELECT CAST(n AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_prompts,
      |  round(${dsumSql("e")} / COUNT(*), 6) AS mean_best_of_n
      |FROM st WHERE nn >= n
      |GROUP BY n ORDER BY n""".stripMargin
    })

  /** q382: ALS fold-in — the index-maintenance arm of q372 (the same
    * landed-artifact symmetry as SA q252 / IVF q261 / k-NN graph
    * q255): a serving system folds a user into a TRAINED model by
    * solving only that user's 2×2 ridge system against the FROZEN
    * landed item factors — no sweep re-run, items untouched. This
    * query probes the landed q372 factor table (pinned-block scan),
    * folds in every user, and publishes the per-bucket serving
    * census: fold-in factor means and the e6-floored reconstruction
    * RMSE. The oracle replays the full sweep + fold-in, so
    * probe ≡ rebuild sits under the hash. */
  val q382 = GQuery(
    "q382_als_fold_in",
    (s, d) => {
      val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
      val ratings = alsRatings(s, d)
      val qn = alsItemFactors(s, d, probe = true)
      val pf = alsUserSolve(ratings, qn.select(col("it"),
        col("nq1"), col("nq2")), "nq1", "nq2")
      val userAgg = pf.withColumn("bucket", col("u") % 8)
        .groupBy(col("bucket"))
        .agg(lcount(lit(1)).as("n_users"),
          dsum(col("p1")).as("sp1"), dsum(col("p2")).as("sp2"))
      val residAgg = ratings.join(pf, Seq("u"))
        .join(broadcast(qn), Seq("it"))
        .withColumn("e_e6", floor((col("r")
          - (col("p1") * col("nq1") + col("p2") * col("nq2"))) * 1e6 + 0.5)
          .cast("long"))
        .groupBy((col("u") % 8).as("bucket"))
        .agg(lcount(lit(1)).as("n_ratings"),
          sum((col("e_e6") * col("e_e6")).cast(dec0)).as("sse"))
      userAgg.join(residAgg, Seq("bucket"))
        .select(col("bucket"), col("n_users"), col("n_ratings"),
          round(col("sp1") / col("n_users"), 6).as("mean_p1"),
          round(col("sp2") / col("n_users"), 6).as("mean_p2"),
          round(sqrt(col("sse").cast("double") / 1e12 / col("n_ratings")), 6)
            .as("rmse"))
        .orderBy(col("bucket"))
    },
    Some(s"""WITH ratings AS (
      |  SELECT user_id AS u, event_id % 32 AS it,
      |    ${dsumSql("value")} / COUNT(*) AS r
      |  FROM events GROUP BY 1, 2),
      |q0 AS (
      |  SELECT it, 1.0 + ln(it + 2) / 10 AS q1,
      |    0.5 + ln(it * 2 + 3) / 10 AS q2
      |  FROM (SELECT DISTINCT it FROM ratings)),
      |us AS (
      |  SELECT u, ${dsumSql("q1 * q1")} AS a11, ${dsumSql("q1 * q2")} AS a12,
      |    ${dsumSql("q2 * q2")} AS a22, ${dsumSql("r * q1")} AS b1,
      |    ${dsumSql("r * q2")} AS b2
      |  FROM ratings JOIN q0 USING (it) GROUP BY u),
      |p AS (
      |  SELECT u,
      |    (b1 * (a22 + 0.1) - b2 * a12)
      |      / ((a11 + 0.1) * (a22 + 0.1) - a12 * a12) AS p1,
      |    (b2 * (a11 + 0.1) - b1 * a12)
      |      / ((a11 + 0.1) * (a22 + 0.1) - a12 * a12) AS p2
      |  FROM us),
      |isv AS (
      |  SELECT it, CAST(COUNT(*) AS BIGINT) AS n,
      |    ${dsumSql("p1 * p1")} AS c11, ${dsumSql("p1 * p2")} AS c12,
      |    ${dsumSql("p2 * p2")} AS c22, ${dsumSql("r * p1")} AS d1,
      |    ${dsumSql("r * p2")} AS d2
      |  FROM ratings JOIN p USING (u) GROUP BY it),
      |qn AS (
      |  SELECT it, n,
      |    (d1 * (c22 + 0.1) - d2 * c12)
      |      / ((c11 + 0.1) * (c22 + 0.1) - c12 * c12) AS nq1,
      |    (d2 * (c11 + 0.1) - d1 * c12)
      |      / ((c11 + 0.1) * (c22 + 0.1) - c12 * c12) AS nq2
      |  FROM isv),
      |us2 AS (
      |  SELECT u, ${dsumSql("nq1 * nq1")} AS a11,
      |    ${dsumSql("nq1 * nq2")} AS a12, ${dsumSql("nq2 * nq2")} AS a22,
      |    ${dsumSql("r * nq1")} AS b1, ${dsumSql("r * nq2")} AS b2
      |  FROM ratings JOIN qn USING (it) GROUP BY u),
      |pf AS (
      |  SELECT u,
      |    (b1 * (a22 + 0.1) - b2 * a12)
      |      / ((a11 + 0.1) * (a22 + 0.1) - a12 * a12) AS p1,
      |    (b2 * (a11 + 0.1) - b1 * a12)
      |      / ((a11 + 0.1) * (a22 + 0.1) - a12 * a12) AS p2
      |  FROM us2),
      |ua AS (
      |  SELECT u % 8 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    ${dsumSql("p1")} AS sp1, ${dsumSql("p2")} AS sp2
      |  FROM pf GROUP BY 1),
      |ra AS (
      |  SELECT r.u % 8 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_ratings,
      |    SUM(CAST(
      |      CAST(floor((r.r - (f.p1 * q.nq1 + f.p2 * q.nq2)) * 1e6 + 0.5)
      |        AS BIGINT)
      |      * CAST(floor((r.r - (f.p1 * q.nq1 + f.p2 * q.nq2)) * 1e6 + 0.5)
      |        AS BIGINT) AS HUGEINT)) AS sse
      |  FROM ratings r JOIN pf f USING (u) JOIN qn q USING (it)
      |  GROUP BY 1)
      |SELECT ua.bucket, ua.n_users, ra.n_ratings,
      |  round(ua.sp1 / ua.n_users, 6) AS mean_p1,
      |  round(ua.sp2 / ua.n_users, 6) AS mean_p2,
      |  round(sqrt(CAST(ra.sse AS DOUBLE) / 1e12 / ra.n_ratings), 6) AS rmse
      |FROM ua JOIN ra ON ua.bucket = ra.bucket
      |ORDER BY ua.bucket""".stripMargin))

  /** q380: off-policy evaluation via IPS and SNIPS (Horvitz–Thompson
    * 1952; Swaminathan & Joachims 2015) — the counterfactual "what
    * would THIS policy have earned on the logged traffic" estimate
    * every bandit/RLHF deployment computes before shipping: logging
    * propensities are the empirical action marginals p̂(a) = c_a/N,
    * and for three candidate policies (two constants + a user-parity
    * mix) the estimators reduce EXACTLY to sums over the
    * (action × parity)-bounded census frame — V̂_IPS = Σ_a S_a/(100·c_a)
    * and the self-normalized V̂_SNIPS = V̂_IPS·N / Σ_a m_a·N/c_a — so
    * the fact-scale work is ONE grouped pass and the e2-scaled reward
    * sums keep everything integer until the final divisions. */
  val q380 = GQuery(
    "q380_offpolicy_ips",
    (s, d) => {
      val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
      val base = events(s, d)
        .select(col("event_type").as("action"), (col("user_id") % 2).as("par"),
          floor(col("value") * 100 + 0.5).cast("long").as("r_e2"))
        .groupBy(col("action"), col("par"))
        .agg(lcount(lit(1)).as("m"), sum(col("r_e2").cast(dec0)).as("sr"))
      val ca = base.groupBy(col("action")).agg(sum(col("m")).as("c_a"))
      val tot = ca.agg(sum(col("c_a")).as("nn"))
      val pols = tot.select(explode(array(lit("always_purchase"),
        lit("always_view"), lit("parity_mix"))).as("policy"))
      base.crossJoin(broadcast(pols))
        .filter(
          (col("policy") === "always_purchase" && col("action") === "purchase")
            || (col("policy") === "always_view" && col("action") === "view")
            || (col("policy") === "parity_mix" && col("action") ===
              when(col("par") === 0, "purchase").otherwise("view")))
        .join(broadcast(ca), Seq("action"))
        .crossJoin(broadcast(tot))
        .groupBy(col("policy"))
        .agg(sum(col("m")).cast("long").as("n_matched"),
          dsum(col("sr").cast("double") / col("c_a") / 100).as("ips"),
          dsum(col("m").cast("double") * col("nn") / col("c_a")).as("w"),
          max(col("nn")).as("nn"))
        .select(col("policy"), col("n_matched"),
          round(col("ips"), 6).as("ips"),
          round(when(col("w") > 0,
            col("ips") * col("nn") / col("w")), 6).as("snips"))
        .orderBy(col("policy"))
    },
    Some(s"""WITH ev AS (
      |  SELECT event_type AS action, user_id % 2 AS par,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS r_e2
      |  FROM events),
      |base AS (
      |  SELECT action, par, CAST(COUNT(*) AS BIGINT) AS m,
      |    SUM(CAST(r_e2 AS HUGEINT)) AS sr
      |  FROM ev GROUP BY action, par),
      |ca AS (SELECT action, CAST(SUM(m) AS BIGINT) AS c_a
      |  FROM base GROUP BY action),
      |tot AS (SELECT CAST(SUM(c_a) AS BIGINT) AS nn FROM ca),
      |pols AS (SELECT unnest(['always_purchase', 'always_view',
      |  'parity_mix']) AS policy),
      |matched AS (
      |  SELECT p.policy, b.m, b.sr, c.c_a, t.nn
      |  FROM base b CROSS JOIN pols p
      |  JOIN ca c ON b.action = c.action CROSS JOIN tot t
      |  WHERE (p.policy = 'always_purchase' AND b.action = 'purchase')
      |    OR (p.policy = 'always_view' AND b.action = 'view')
      |    OR (p.policy = 'parity_mix' AND b.action =
      |      CASE WHEN b.par = 0 THEN 'purchase' ELSE 'view' END))
      |SELECT policy, CAST(SUM(m) AS BIGINT) AS n_matched,
      |  round(${dsumSql("CAST(sr AS DOUBLE) / c_a / 100")}, 6) AS ips,
      |  round(CASE WHEN ${dsumSql("CAST(m AS DOUBLE) * nn / c_a")} > 0
      |    THEN ${dsumSql("CAST(sr AS DOUBLE) / c_a / 100")} * MAX(nn)
      |      / ${dsumSql("CAST(m AS DOUBLE) * nn / c_a")} END, 6) AS snips
      |FROM matched GROUP BY policy ORDER BY policy""".stripMargin))

  def queries: Seq[GQuery] =
    Seq(q203, q204, q205, q206, q207, q218, q219, q240, q290, q304, q372,
      q377, q380, q382)
}
