package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.operators.{Sampling, Splits}

/** q97: deterministic data mixing over `documents` — a mixture plan
  * from per-language character budgets (no-upsampling rates toward a
  * target mix, Spanish deliberately excluded to exercise the rate-0
  * drop), the md5-draw rate sample it drives, and the per-stratum
  * hash-rank cap. Every draw is md5-derived, so the DuckDB oracle
  * replays the exact sample membership. */
object SamplingQueries {

  private val dsumSql = (x: String) => s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"

  private val targets = Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.15)
  private def targetShareSql: String = {
    val total = targets.values.sum
    "CASE " + targets.map { case (k, s) =>
      s"WHEN lang = '$k' THEN ${s / total}"
    }.mkString(" ") + " ELSE 0.0 END"
  }

  val q97 = GQuery(
    "q97_stratified_mixing",
    (s, d) => {
      val docs = documents(s, d)
      val observed = docs.groupBy(col("lang"))
        .agg(sum(col("n_chars")).cast("double").as("w"))
      val plan = Sampling.mixturePlan(observed, "lang", "w", targets)
      val sampled = Sampling.sampleByPlan(docs, "lang", col("doc_id"), plan)
        .groupBy(col("lang"))
        .agg(lcount(lit(1)).as("n_sampled"),
          sum(col("n_chars")).cast("long").as("chars_sampled"))
      val capped = Sampling.takePerStratum(docs, Seq("lang"), col("doc_id"), n = 50)
        .groupBy(col("lang"))
        .agg(lcount(lit(1)).as("n_capped"),
          sum(col("n_chars")).cast("long").as("chars_capped"))
      docs.groupBy(col("lang")).agg(lcount(lit(1)).as("n_docs"))
        .join(plan.select(col("lang"), round(col("rate"), 6).as("rate")), Seq("lang"))
        .join(sampled, Seq("lang"), "left")
        .join(capped, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), col("rate"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          coalesce(col("chars_sampled"), lit(0L)).as("chars_sampled"),
          col("n_capped"), col("chars_capped"))
    },
    Some(s"""WITH obs AS (
      |  SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS w, COUNT(*) AS n_docs
      |  FROM documents GROUP BY lang),
      |shared AS (SELECT *, $targetShareSql AS share FROM obs),
      |scaled AS (
      |  SELECT s.*, m.scale FROM shared s,
      |    (SELECT MIN(w / share) AS scale FROM shared WHERE share > 0) m),
      |plan AS (
      |  SELECT lang, n_docs,
      |    CASE WHEN share = 0.0 THEN 0.0
      |         ELSE LEAST(1.0, share * scale / w) END AS rate
      |  FROM scaled),
      |draw AS (
      |  SELECT d.lang, d.doc_id, d.n_chars, p.rate,
      |    CAST(('0x' || substr(md5('mix-' || CAST(d.doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
      |      / 268435456.0 AS u_mix,
      |    CAST(('0x' || substr(md5('cap-' || CAST(d.doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
      |      / 268435456.0 AS u_cap
      |  FROM documents d JOIN plan p ON d.lang = p.lang),
      |sampled AS (
      |  SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
      |  FROM draw WHERE u_mix < rate GROUP BY lang),
      |capped AS (
      |  SELECT lang, COUNT(*) AS n_capped, CAST(SUM(n_chars) AS BIGINT) AS chars_capped
      |  FROM (SELECT lang, n_chars,
      |          row_number() OVER (PARTITION BY lang ORDER BY u_cap, doc_id) AS rn
      |        FROM draw)
      |  WHERE rn <= 50 GROUP BY lang)
      |SELECT p.lang, CAST(p.n_docs AS BIGINT) AS n_docs, round(p.rate, 6) AS rate,
      |  COALESCE(s.n_sampled, 0) AS n_sampled,
      |  COALESCE(s.chars_sampled, 0) AS chars_sampled,
      |  c.n_capped, c.chars_capped
      |FROM plan p LEFT JOIN sampled s ON p.lang = s.lang
      |  LEFT JOIN capped c ON p.lang = c.lang""".stripMargin))

  /** q100: deterministic train/val/test split + per-split shard layout
    * over `documents` — md5-threshold split assignment
    * ([[graft.operators.Splits.assignSplit]]), hash-bucketed shards
    * with within-shard rank ([[graft.operators.Splits.shardLayout]]).
    * The `order_checksum` (Σ pos·doc_id per split) pins the exact rank
    * assignment, not just the membership counts, so any ordering drift
    * hash-fails. Threshold literals come from [[Splits.cumThresholds]]
    * in BOTH engines (0.8 + 0.1 ≠ the double 0.9). */
  private val splitSpec = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  val q100 = GQuery(
    "q100_hash_split_shards",
    (s, d) => {
      val split = Splits.assignSplit(documents(s, d), col("doc_id"), splitSpec)
      Splits.shardLayout(split, col("doc_id"), nShards = 8)
        .groupBy(col("split"))
        .agg(
          lcount(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          countDistinct(col("shard")).cast("long").as("n_shards"),
          max(col("pos") + 1L).as("max_shard_docs"),
          sum(col("pos") * col("doc_id")).as("order_checksum"))
    },
    Some {
      val th = Splits.cumThresholds(splitSpec)
      val splitCase = "CASE " + th.init.map { case (n, ub) =>
        s"WHEN u_split < $ub THEN '$n'"
      }.mkString(" ") + s" ELSE '${th.last._1}' END"
      s"""WITH draw AS (
      |  SELECT doc_id, n_chars,
      |    CAST(('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
      |      / 268435456.0 AS u_split,
      |    CAST(('0x' || substr(md5('shard-' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
      |      / 268435456.0 AS u_shard
      |  FROM documents),
      |assigned AS (
      |  SELECT doc_id, n_chars, u_shard, $splitCase AS split,
      |    CAST(FLOOR(u_shard * 8) AS BIGINT) AS shard
      |  FROM draw),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY split, shard ORDER BY u_shard, doc_id) - 1 AS pos
      |  FROM assigned)
      |SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |  CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards,
      |  CAST(MAX(pos + 1) AS BIGINT) AS max_shard_docs,
      |  CAST(SUM(pos * doc_id) AS BIGINT) AS order_checksum
      |FROM ranked GROUP BY split""".stripMargin
    })

  /** q104: temperature-scaled mixture plan over per-language character
    * budgets ([[Sampling.temperaturePlan]], tau = 0.5) — the standard
    * low-resource-language boost. Shares/rates pass one `pow` per
    * stratum; per repo convention every transcendental-derived output
    * is rounded on both sides (the decimal-routed total keeps the sum
    * order-independent). `expected_chars` = rate · observed shows the
    * realized no-upsampling mix. */
  val q104 = GQuery(
    "q104_temperature_mixture",
    (s, d) => {
      val observed = documents(s, d).groupBy(col("lang"))
        .agg(sum(col("n_chars")).cast("double").as("w"))
      Sampling.temperaturePlan(observed, "lang", "w", tau = 0.5)
        .select(col("lang"),
          col("observed").cast("long").as("observed_chars"),
          round(col("share"), 6).as("share"),
          round(col("rate"), 6).as("rate"),
          round(col("rate") * col("observed"), 2).as("expected_chars"))
    },
    Some("""WITH obs AS (
      |  SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS w FROM documents GROUP BY lang),
      |wt AS (SELECT lang, w, POW(w, 0.5) AS wt FROM obs),
      |tot AS (
      |  SELECT CAST(SUM(CAST(wt AS DECIMAL(38,6))) AS DOUBLE) AS tot FROM wt),
      |shared AS (SELECT lang, w, wt / (SELECT tot FROM tot) AS share FROM wt),
      |scaled AS (
      |  SELECT s.*, m.scale FROM shared s,
      |    (SELECT MIN(w / share) AS scale FROM shared WHERE share > 0) m),
      |plan AS (
      |  SELECT lang, w, share,
      |    CASE WHEN share = 0.0 THEN 0.0
      |         ELSE LEAST(1.0, share * scale / w) END AS rate
      |  FROM scaled)
      |SELECT lang, CAST(w AS BIGINT) AS observed_chars,
      |  round(share, 6) AS share, round(rate, 6) AS rate,
      |  round(rate * w, 2) AS expected_chars
      |FROM plan""".stripMargin))

  /** q128: weighted sampling without replacement
    * ([[graft.operators.Sampling.weightedSample]], Efraimidis–Spirtes
    * keys over md5 uniforms) — 100 documents drawn with probability
    * proportional to `n_chars`, folded to a per-language census whose
    * `id_checksum` pins the exact membership. The `ln(u)/w` key is
    * replayed verbatim by the oracle, so both engines must elect the
    * same 100 rows. */
  val q128 = GQuery(
    "q128_weighted_sample",
    (s, d) =>
      Sampling.weightedSample(documents(s, d), col("doc_id"), col("n_chars"),
          n = 100, salt = "ws")
        .groupBy(col("lang"))
        .agg(lcount(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          sum(col("doc_id")).as("id_checksum")),
    Some("""WITH keyed AS (
      |  SELECT doc_id, lang, n_chars,
      |    ln((CAST(('0x' || substr(md5('ws-' || CAST(doc_id AS VARCHAR)), 1, 7))
      |          AS BIGINT) + 0.5) / 268435456.0)
      |      / CAST(n_chars AS DOUBLE) AS k
      |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      |top AS (SELECT * FROM keyed ORDER BY k DESC, doc_id LIMIT 100)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      |FROM top GROUP BY lang""".stripMargin))

  /** q165: water-filling token-budget allocation
    * ([[graft.operators.WaterFill]]) — max-min-fair division of a
    * total token budget across the per-language availabilities, 60 %
    * of the corpus's token mass as the budget so the small languages
    * sit under the water line (capped, keep everything) while the
    * large ones split the rest evenly. Integer-exact: Σ alloc =
    * budget exactly, and the oracle replays the level search and the
    * remainder distribution row for row. */
  val q165 = GQuery(
    "q165_waterfill_budget",
    (s, d) => {
      val avail = documents(s, d)
        .select(col("lang"),
          size(graft.text.TextFunctions.wsTokens(col("text"))).cast("long").as("tok"))
        .groupBy(col("lang")).agg(sum(col("tok")).as("avail"))
      // the one driver-side scalar (total token mass → budget)
      val total = avail.agg(sum(col("avail"))).head().getLong(0)
      graft.operators.WaterFill(avail, "lang", "avail", total * 6 / 10)
        .select(col("domain").as("lang"), col("avail").as("avail_tokens"),
          col("alloc").as("alloc_tokens"), col("capped"))
    },
    Some("""WITH avail AS (
      |  SELECT lang AS domain,
      |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS avail
      |  FROM documents GROUP BY 1),
      |b AS (SELECT (SUM(avail) * 6) // 10 AS budget FROM avail),
      |scan AS (
      |  SELECT domain, avail,
      |    COALESCE(SUM(avail) OVER (ORDER BY avail, domain
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p_prev,
      |    ROW_NUMBER() OVER (ORDER BY avail, domain) AS j,
      |    COUNT(*) OVER () AS n
      |  FROM avail),
      |scan2 AS (
      |  SELECT *, (SELECT budget FROM b) - p_prev AS rem, n - j + 1 AS cnt
      |  FROM scan),
      |lvl AS (
      |  SELECT rem // cnt AS level, rem - (rem // cnt) * cnt AS extra
      |  FROM scan2 WHERE rem <= avail * cnt ORDER BY j LIMIT 1),
      |marked AS (
      |  SELECT s.domain, s.avail, l.level, l.extra,
      |    (l.level IS NULL OR s.avail <= l.level) AS capped
      |  FROM scan2 s LEFT JOIN lvl l ON TRUE),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY capped ORDER BY domain) AS r
      |  FROM marked)
      |SELECT domain AS lang, avail AS avail_tokens,
      |  CAST(CASE WHEN capped THEN avail
      |    ELSE level + CASE WHEN r <= extra THEN 1 ELSE 0 END END AS BIGINT)
      |    AS alloc_tokens,
      |  capped
      |FROM ranked""".stripMargin))

  /** q166: rendezvous (highest-random-weight) sharding
    * ([[graft.operators.Splits.rendezvousShard]]) — stable doc→shard
    * assignment where growing the shard count from 8 to 9 moves ONLY
    * the docs the new shard wins (~1/9 of each shard), never
    * reshuffling between surviving shards: the incremental-corpus
    * property modulo hashing lacks. The census proves it — per
    * 8-shard bucket, every moved doc's new shard is shard 8. Map-only
    * per row (an array fold over the shard list, no explode/shuffle);
    * the md5 weights make both engines elect identical winners. */
  val q166 = GQuery(
    "q166_rendezvous_shards",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"))
        .withColumn("s8", Splits.rendezvousShard(col("doc_id"), 8))
        .withColumn("s9", Splits.rendezvousShard(col("doc_id"), 9))
      docs.groupBy(col("s8").as("shard"))
        .agg(lcount(lit(1)).as("n_docs"),
          lcount(when(col("s8") =!= col("s9"), 1)).as("n_moved"),
          lcount(when(col("s8") =!= col("s9") && col("s9") =!= 8, 1))
            .as("n_moved_elsewhere"))
    },
    Some("""WITH w AS (
      |  SELECT doc_id, s.s,
      |    md5(CAST(s.s AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents CROSS JOIN (SELECT UNNEST(generate_series(0, 8)) AS s) s),
      |a8 AS (SELECT doc_id, arg_max(s, h) AS s8 FROM w WHERE s < 8 GROUP BY doc_id),
      |a9 AS (SELECT doc_id, arg_max(s, h) AS s9 FROM w GROUP BY doc_id)
      |SELECT a8.s8 AS shard, COUNT(*) AS n_docs,
      |  COUNT(CASE WHEN s8 != s9 THEN 1 END) AS n_moved,
      |  COUNT(CASE WHEN s8 != s9 AND s9 != 8 THEN 1 END) AS n_moved_elsewhere
      |FROM a8 JOIN a9 ON a8.doc_id = a9.doc_id GROUP BY 1""".stripMargin))

  /** q194: Neyman (optimal) allocation of a fixed sample budget across
    * strata ([[graft.operators.Allocation]]) — the survey-design step
    * behind stratified estimation (the reference's municipal frames
    * are exactly such strata) and stratified eval sampling: n_h ∝
    * N_h·S_h, integerized by largest-remainder rounding so Σ alloc =
    * budget EXACTLY, each stratum capped at N_h with the surplus
    * re-granted in remainder order. Fixture plants a tiny
    * huge-variance stratum (every 997th order, prices ×100) whose raw
    * share exceeds its population, exercising the cap + re-grant arm.
    * Exact decimal sums + IEEE sqrt/divide, so every rounding decision
    * replays in the oracle. */
  val q194 = GQuery(
    "q194_neyman_allocation",
    (s, d) => {
      val src = orders(s, d).select(
        when(col("o_orderkey") % 997 === 0, lit("rare"))
          .otherwise(concat(lit("S"), (col("o_orderkey") % 5).cast("string")))
          .as("stratum"),
        (col("o_totalprice") *
          when(col("o_orderkey") % 997 === 0, lit(100.0)).otherwise(lit(1.0)))
          .as("x"))
      graft.operators.Allocation.neyman(src, "stratum", "x", budget = 500L)
    },
    Some(s"""WITH src AS (
      |  SELECT CASE WHEN o_orderkey % 997 = 0 THEN 'rare'
      |              ELSE 'S' || CAST(o_orderkey % 5 AS VARCHAR) END AS stratum,
      |    o_totalprice * (CASE WHEN o_orderkey % 997 = 0 THEN 100.0 ELSE 1.0 END) AS x
      |  FROM orders),
      |per AS (
      |  SELECT stratum, COUNT(*) AS n_rows,
      |    ${dsumSql("x")} AS s1, ${dsumSql("x * x")} AS s2
      |  FROM src GROUP BY stratum),
      |v AS (
      |  SELECT *, CASE WHEN n_rows > 1
      |    THEN GREATEST((n_rows * s2 - s1 * s1)
      |                  / (CAST(n_rows AS DOUBLE) * (n_rows - 1.0)), 0.0)
      |    ELSE 0.0 END AS var FROM per),
      |w AS (SELECT *, sqrt(var) AS sd, n_rows * sqrt(var) AS nhsh FROM v),
      |t AS (SELECT ${dsumSql("nhsh")} AS tot FROM w),
      |r AS (
      |  SELECT w.*, CASE WHEN t.tot > 0 THEN nhsh / t.tot ELSE 0.0 END AS weight
      |  FROM w, t),
      |r2 AS (SELECT *, weight * 500 AS raw,
      |              CAST(FLOOR(weight * 500) AS BIGINT) AS base FROM r),
      |rr AS (
      |  SELECT *,
      |    row_number() OVER (ORDER BY (weight > 0) DESC,
      |      raw - FLOOR(raw) DESC, stratum ASC) AS rr,
      |    500 - SUM(base) OVER () AS leftover
      |  FROM r2),
      |a0 AS (SELECT *, base + CASE WHEN weight > 0 AND rr <= leftover
      |         THEN 1 ELSE 0 END AS alloc0
      |       FROM rr),
      |c AS (SELECT *, LEAST(alloc0, n_rows) AS capped FROM a0),
      |sfin AS (
      |  SELECT *, SUM(alloc0 - capped) OVER () AS surplus,
      |    CASE WHEN weight > 0 THEN n_rows - capped ELSE 0 END AS head,
      |    SUM(CASE WHEN weight > 0 THEN n_rows - capped ELSE 0 END)
      |      OVER (ORDER BY (weight > 0) DESC, raw - FLOOR(raw) DESC, stratum ASC
      |      ROWS UNBOUNDED PRECEDING) AS cumhead
      |  FROM c)
      |SELECT stratum, n_rows, round(sd, 6) AS sd, round(weight, 6) AS weight,
      |  CAST(capped + GREATEST(0, LEAST(head, surplus - (cumhead - head)))
      |       AS BIGINT) AS alloc
      |FROM sfin""".stripMargin))

  /** q202: the training-mix assembly DAG composed end-to-end — the
    * LLM counterpart of the fisheries q95 composition and the
    * curation q141: observe per-language mass → temperature-scale the
    * mixture (q104's plan, tau = 0.5) → realize it with seeded
    * Bernoulli thinning at the planned rates (md5 draws, ST8 policy)
    * → assign reproducible train/val/test splits → per-(split, lang)
    * census with an id checksum pinning EXACT membership. Every stage
    * is gated alone (q104, q128's draw machinery, q100); this entry
    * gates the composition — plan rates flowing into row-level draws
    * flowing into split thresholds — under one hash. The split
    * thresholds are embedded as the ACCUMULATED double literals
    * ([[Splits.cumThresholds]]'s contract: 0.8 + 0.1 is not the
    * literal 0.9). */
  val q202 = {
    val thresholds = Splits.cumThresholds(
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    GQuery(
      "q202_training_mix_dag",
      (s, d) => {
        val docs = documents(s, d)
        val observed = docs.groupBy(col("lang"))
          .agg(sum(col("n_chars")).cast("double").as("w"))
        val plan = Sampling.temperaturePlan(observed, "lang", "w", tau = 0.5)
        val sampled = Sampling.sampleByPlan(docs, "lang", col("doc_id"),
          plan, salt = "mixdag")
        val split = Splits.assignSplit(sampled, col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "mixdag-split")
        split.groupBy(col("split"), col("lang"))
          .agg(
            lcount(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars"),
            sum(col("doc_id")).as("id_checksum"))
      },
      Some(s"""WITH obs AS (
        |  SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS w FROM documents GROUP BY lang),
        |wt AS (SELECT lang, w, POW(w, 0.5) AS wt FROM obs),
        |tot AS (
        |  SELECT CAST(SUM(CAST(wt AS DECIMAL(38,6))) AS DOUBLE) AS tot FROM wt),
        |shared AS (SELECT lang, w, wt / (SELECT tot FROM tot) AS share FROM wt),
        |scaled AS (
        |  SELECT s.*, m.scale FROM shared s,
        |    (SELECT MIN(w / share) AS scale FROM shared WHERE share > 0) m),
        |plan AS (
        |  SELECT lang,
        |    CASE WHEN share = 0.0 THEN 0.0
        |         ELSE LEAST(1.0, share * scale / w) END AS rate
        |  FROM scaled),
        |sampled AS (
        |  SELECT d.* FROM documents d JOIN plan p ON d.lang = p.lang
        |  WHERE CAST(('0x' || substr(md5('mixdag-' || CAST(d.doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
        |        / 268435456.0 < p.rate),
        |assigned AS (
        |  SELECT *, CASE
        |      WHEN u < ${thresholds(0)._2} THEN 'train'
        |      WHEN u < ${thresholds(1)._2} THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM (SELECT *,
        |      CAST(('0x' || substr(md5('mixdag-split-' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
        |        / 268435456.0 AS u
        |    FROM sampled))
        |SELECT split, lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        |FROM assigned GROUP BY split, lang""".stripMargin))
  }

  /** q235: per-group A-ES weighted sampling
    * ([[graft.operators.Sampling.weightedSamplePerGroup]]) — the
    * stratified face of q128: within every language, the 20 documents
    * with the largest ln(u)/n_chars keys form a char-mass-proportional
    * sample without replacement. The row_number spelling rides the
    * TopKPerKey rewrite (bounded per-key heap, never a full per-group
    * sort — plan-gated); the census pins exact membership via the id
    * checksum. */
  val q235 = GQuery(
    "q235_grouped_weighted_sample",
    (s, d) =>
      Sampling.weightedSamplePerGroup(documents(s, d), Seq("lang"),
          col("doc_id"), col("n_chars"), n = 20, salt = "gws")
        .groupBy(col("lang"))
        .agg(lcount(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          sum(col("doc_id")).as("id_checksum")),
    Some("""WITH keyed AS (
      |  SELECT doc_id, lang, n_chars,
      |    ln((CAST(('0x' || substr(md5('gws-' || CAST(doc_id AS VARCHAR)), 1, 7))
      |          AS BIGINT) + 0.5) / 268435456.0)
      |      / CAST(n_chars AS DOUBLE) AS k
      |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      |rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY lang
      |    ORDER BY k DESC, doc_id) AS rn
      |  FROM keyed)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      |FROM rk WHERE rn <= 20 GROUP BY lang""".stripMargin))

  /** q307: leakage-safe GROUP-keyed train/val/test split — q100 hashes
    * the document id, which scatters a source's near-identical pages
    * across train AND test (the classic contamination-by-split bug);
    * hashing the GROUP key (source) instead puts every document of a
    * domain on one side by construction. The census reports, per
    * group-split: group/doc/char mass, plus `n_docs_leaked` — how many
    * of these docs the doc-keyed q100 split would have sent to a
    * DIFFERENT split (the leakage a group-keyed split prevents,
    * measured, not asserted). Both assignments are md5-threshold draws
    * ([[Splits.splitExpr]]) the oracle replays exactly; one map-side
    * projection + one groupBy at any corpus size. */
  val q307 = GQuery(
    "q307_group_split",
    (s, d) => {
      val spec = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      documents(s, d)
        .withColumn("split", Splits.splitExpr(col("source"), spec))
        .withColumn("doc_split", Splits.splitExpr(col("doc_id"), spec))
        .groupBy(col("split"))
        .agg(
          countDistinct(col("source")).cast("long").as("n_groups"),
          lcount(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          coalesce(sum(when(col("doc_split") =!= col("split"), 1L)), lit(0L))
            .as("n_docs_leaked"))
        .orderBy(col("split"))
    },
    Some {
      val th = Splits.cumThresholds(
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      def splitCase(u: String) = "CASE " + th.init.map { case (n, ub) =>
        s"WHEN $u < $ub THEN '$n'"
      }.mkString(" ") + s" ELSE '${th.last._1}' END"
      s"""WITH draw AS (
      |  SELECT source, doc_id, n_chars,
      |    CAST(('0x' || substr(md5('split-' || source), 1, 7)) AS BIGINT)
      |      / 268435456.0 AS u_g,
      |    CAST(('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
      |      / 268435456.0 AS u_d
      |  FROM documents),
      |assigned AS (
      |  SELECT source, doc_id, n_chars,
      |    ${splitCase("u_g")} AS split,
      |    ${splitCase("u_d")} AS doc_split
      |  FROM draw)
      |SELECT split, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_groups,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |  COALESCE(CAST(SUM(CASE WHEN doc_split <> split THEN 1 END) AS BIGINT), 0)
      |    AS n_docs_leaked
      |FROM assigned GROUP BY split ORDER BY split""".stripMargin
    })

  /** q334: Neyman optimal allocation — the survey-design face of the
    * sampling family (q97's mixing fixes rates from character budgets;
    * Neyman asks where a FIXED annotation budget buys the most
    * variance reduction: n_h ∝ N_h·σ_h, so volatile strata get more
    * than their population share). Strata = document source; y =
    * n_chars; σ_h from exact integer moments (Σy, Σy² decimal-routed
    * past int64, one sqrt each); budget 1000 allocated by
    * floor(B·share) beside the proportional floor(B·N_h/N) baseline.
    * One fact-sized groupBy; the allocation math runs on the
    * strata-bounded frame with the Σ N·σ scalar broadcast back. */
  val q334 = GQuery(
    "q334_neyman_allocation",
    (s, d) => {
      val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
      val strata = documents(s, d)
        .groupBy(col("source"))
        .agg(lcount(lit(1)).as("n_h"),
          sum(col("n_chars").cast(dec0)).as("sy"),
          sum(col("n_chars").cast(dec0) * col("n_chars")).as("syy"))
        .withColumn("sd",
          when(col("n_h") > 1, sqrt(
            (col("n_h") * col("syy") - col("sy") * col("sy")).cast("double")
              / col("n_h").cast("double")
              / (col("n_h") - 1).cast("double"))).otherwise(lit(0.0)))
        .withColumn("nsd", col("n_h").cast("double") * col("sd"))
      val tot = strata.agg(
        sum(col("n_h")).as("n_total"),
        sum(col("nsd").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .cast("double").as("sum_nsd"))
      strata.crossJoin(broadcast(tot))
        .select(col("source"), col("n_h"),
          round(col("sd"), 6).as("sd"),
          floor(lit(1000.0) * col("nsd") / col("sum_nsd")).cast("long")
            .as("neyman_n"),
          expr("(1000 * n_h) div n_total").as("prop_n"))
        .orderBy(col("source"))
    },
    Some("""WITH strata AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_h,
      |    SUM(CAST(n_chars AS HUGEINT)) AS sy,
      |    SUM(CAST(n_chars AS HUGEINT) * n_chars) AS syy
      |  FROM documents GROUP BY source),
      |sds AS (
      |  SELECT source, n_h,
      |    CASE WHEN n_h > 1 THEN sqrt(
      |      CAST(n_h * syy - sy * sy AS DOUBLE)
      |        / CAST(n_h AS DOUBLE) / CAST(n_h - 1 AS DOUBLE))
      |      ELSE 0.0 END AS sd
      |  FROM strata),
      |nsds AS (
      |  SELECT source, n_h, sd, CAST(n_h AS DOUBLE) * sd AS nsd FROM sds),
      |tot AS (
      |  SELECT CAST(SUM(n_h) AS BIGINT) AS n_total,
      |    CAST(SUM(CAST(nsd AS DECIMAL(38,6))) AS DOUBLE) AS sum_nsd
      |  FROM nsds)
      |SELECT s.source, s.n_h, round(s.sd, 6) AS sd,
      |  CAST(FLOOR(1000.0 * s.nsd / t.sum_nsd) AS BIGINT) AS neyman_n,
      |  (1000 * s.n_h) // t.n_total AS prop_n
      |FROM nsds s CROSS JOIN tot t ORDER BY s.source""".stripMargin))

  /** q352: out-of-fold target encoding — the leakage-safe categorical
    * encoder (the q108 split-leakage lesson applied to FEATURES: a
    * category's target mean computed on data that includes the row
    * itself leaks the label into the feature): 5 md5-derived folds,
    * each row's encoding uses only the OTHER folds' (sum, count) for
    * its category plus m = 10 pseudo-observations of the global mean
    * (smoothing), all derived by SUBTRACTION from the category totals
    * — one fact-sized pass builds the (category, fold) cells, the
    * encoder table is cells-bounded and broadcasts back. The census
    * reports, per fold, the feature↔target correlation of the OOF
    * encoding beside the naive full-data one (the leakage gap the
    * operator exists to remove), via decimal-routed moments. */
  val q352 = GQuery(
    "q352_target_encoding",
    (s, d) => {
      val rows = events(s, d).select(col("event_id"),
          (col("user_id") % 100).as("cat"), col("value").as("y"))
        .withColumn("fold", floor(expr(
          """CAST(conv(substring(md5(concat('fold-', CAST(event_id AS STRING))),
            |1, 7), 16, 10) AS BIGINT) / 268435456.0""".stripMargin
            .replace("\n", " ")) * 5).cast("long"))
        .localCheckpoint(eager = false) // cells + scoring probe it
      val cells = rows.groupBy(col("cat"), col("fold"))
        .agg(lcount(lit(1)).as("n_cf"), dsum(col("y")).as("s_cf"))
        .localCheckpoint(eager = false) // totals + encoder probe it
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      val catTot = cells.groupBy(col("cat"))
        .agg(sum(col("n_cf")).as("n_c"),
          sum(col("s_cf").cast(dec)).cast("double").as("s_c"))
      val g = rows.agg((dsum(col("y")) / count(lit(1))).as("gmean"))
      val enc = cells.join(catTot, Seq("cat")).crossJoin(broadcast(g))
        .select(col("cat"), col("fold"),
          ((col("s_c") - col("s_cf") + lit(10.0) * col("gmean"))
            / (col("n_c") - col("n_cf") + 10).cast("double")).as("e_oof"),
          ((col("s_c") + lit(10.0) * col("gmean"))
            / (col("n_c") + 10).cast("double")).as("e_naive"))
      def corr(e: org.apache.spark.sql.Column) = {
        val n = count(lit(1)).cast("double")
        (n * dsum(e * col("y")) - dsum(e) * dsum(col("y"))) /
          (sqrt(n * dsum(e * e) - dsum(e) * dsum(e))
            * sqrt(n * dsum(col("y") * col("y")) - dsum(col("y")) * dsum(col("y"))))
      }
      rows.join(broadcast(enc), Seq("cat", "fold"))
        .groupBy(col("fold"))
        .agg(lcount(lit(1)).as("n"),
          round(corr(col("e_oof")), 6).as("corr_oof"),
          round(corr(col("e_naive")), 6).as("corr_naive"))
        .orderBy(col("fold"))
    },
    Some(s"""WITH rows_ AS (
      |  SELECT event_id, user_id % 100 AS cat, value AS y,
      |    CAST(FLOOR(CAST(('0x' || substr(md5('fold-' ||
      |      CAST(event_id AS VARCHAR)), 1, 7)) AS BIGINT)
      |      / 268435456.0 * 5) AS BIGINT) AS fold
      |  FROM events),
      |cells AS (
      |  SELECT cat, fold, CAST(COUNT(*) AS BIGINT) AS n_cf,
      |    ${dsumSql("y")} AS s_cf
      |  FROM rows_ GROUP BY cat, fold),
      |ct AS (
      |  SELECT cat, CAST(SUM(n_cf) AS BIGINT) AS n_c,
      |    CAST(SUM(CAST(s_cf AS DECIMAL(38,6))) AS DOUBLE) AS s_c
      |  FROM cells GROUP BY cat),
      |g AS (SELECT ${dsumSql("y")} / COUNT(*) AS gmean FROM rows_),
      |enc AS (
      |  SELECT c.cat, c.fold,
      |    (t.s_c - c.s_cf + 10.0 * g.gmean)
      |      / CAST(t.n_c - c.n_cf + 10 AS DOUBLE) AS e_oof,
      |    (t.s_c + 10.0 * g.gmean) / CAST(t.n_c + 10 AS DOUBLE) AS e_naive
      |  FROM cells c JOIN ct t ON c.cat = t.cat CROSS JOIN g),
      |j AS (
      |  SELECT r.fold, r.y, e.e_oof, e.e_naive
      |  FROM rows_ r JOIN enc e ON r.cat = e.cat AND r.fold = e.fold)
      |SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
      |  round((CAST(COUNT(*) AS DOUBLE) * ${dsumSql("e_oof * y")}
      |      - ${dsumSql("e_oof")} * ${dsumSql("y")})
      |    / (sqrt(CAST(COUNT(*) AS DOUBLE) * ${dsumSql("e_oof * e_oof")}
      |        - ${dsumSql("e_oof")} * ${dsumSql("e_oof")})
      |      * sqrt(CAST(COUNT(*) AS DOUBLE) * ${dsumSql("y * y")}
      |        - ${dsumSql("y")} * ${dsumSql("y")})), 6) AS corr_oof,
      |  round((CAST(COUNT(*) AS DOUBLE) * ${dsumSql("e_naive * y")}
      |      - ${dsumSql("e_naive")} * ${dsumSql("y")})
      |    / (sqrt(CAST(COUNT(*) AS DOUBLE) * ${dsumSql("e_naive * e_naive")}
      |        - ${dsumSql("e_naive")} * ${dsumSql("e_naive")})
      |      * sqrt(CAST(COUNT(*) AS DOUBLE) * ${dsumSql("y * y")}
      |        - ${dsumSql("y")} * ${dsumSql("y")})), 6) AS corr_naive
      |FROM j GROUP BY fold ORDER BY fold""".stripMargin))

  def queries: Seq[GQuery] =
    Seq(q97, q100, q104, q128, q165, q166, q194, q202, q235, q307, q334,
      q352)
}
