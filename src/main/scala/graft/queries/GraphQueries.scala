package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.graph.PageRank

/** Link-graph centrality surface: PageRank over the synthesized
  * document/domain link graph — the source-quality prior web-scale
  * curation attaches to every domain before content filtering (the
  * role harmonic centrality / PageRank play in Common Crawl-derived
  * corpora), feeding the domain-cap stage (q150) the same way the
  * reference's dim tables feed its validators.
  *
  * The integer-arithmetic power iteration ([[graft.graph.PageRank]])
  * is bit-reproducible, so the oracle UNROLLS the same four rounds as
  * SQL CTEs with the same truncating divisions — the iteration
  * dynamics themselves sit under the hash gate, not just a final
  * projection.
  */
object GraphQueries {

  /** Node modulus: 101 is coprime to the doc-link multipliers and far
    * below the sf0.01 doc count, so every residue appears as a source
    * (no dangling nodes in practice — the dangling term is still
    * computed on both sides). */
  private val M = 101
  private val Scale = 1000000000000L
  private val Iters = 4

  private def iterCte(prev: String, cur: String, p: String = ""): String =
    s"""$cur AS (
       |  SELECT n.node,
       |    CAST((($Scale * 15) // 100) // (SELECT COUNT(*) FROM ${p}nodes)
       |      + COALESCE(c.csum, 0)
       |      + (((SELECT COALESCE(SUM(r.rank), 0) FROM $prev r
       |           WHERE r.node NOT IN (SELECT src FROM ${p}o)) * 85) // 100)
       |        // (SELECT COUNT(*) FROM ${p}nodes) AS BIGINT) AS rank
       |  FROM ${p}nodes n LEFT JOIN (
       |    SELECT e.dst AS node,
       |      CAST(SUM((((r.rank * 85) // 100) * e.w) // o.wtot) AS BIGINT) AS csum
       |    FROM ${p}e e JOIN $prev r ON e.src = r.node JOIN ${p}o o ON e.src = o.src
       |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin

  /** q153: 4-round damped PageRank over the domain link graph. Each
    * doc contributes three outlinks via fixed affine maps mod [[M]];
    * edge weight = link multiplicity, self-loops dropped. Output per
    * domain: the integer rank (units of 1e-12), in/out edge mass. */
  val q153 = GQuery(
    "q153_pagerank_domains",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"))
      val e = docs
        .select(col("doc_id"), explode(array(
          (col("doc_id") * 7 + 13) % M,
          (col("doc_id") * 13 + 29) % M,
          (col("doc_id") * 31 + 7) % M)).as("t"))
        .select(concat(lit("d"), col("doc_id") % M).as("src"),
          concat(lit("d"), col("t")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst")).agg(lcount(lit(1)).as("w"))
      val pr = PageRank.run(e, iters = Iters, scale = Scale)
      val inW = e.groupBy(col("dst").as("node")).agg(sum(col("w")).as("in_w"))
      val outW = e.groupBy(col("src").as("node")).agg(sum(col("w")).as("out_w"))
      pr.join(inW, Seq("node"), "left")
        .join(outW, Seq("node"), "left")
        .select(col("node").as("domain"), col("rank").as("rank_e12"),
          coalesce(col("in_w"), lit(0L)).as("in_w"),
          coalesce(col("out_w"), lit(0L)).as("out_w"))
    },
    Some(s"""WITH $linkGraphCtes,
      |inw AS (SELECT dst AS node, CAST(SUM(w) AS BIGINT) AS in_w FROM e GROUP BY dst),
      |outw AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS out_w FROM e GROUP BY src)
      |SELECT r.node AS domain, r.rank AS rank_e12,
      |  COALESCE(i.in_w, 0) AS in_w, COALESCE(ou.out_w, 0) AS out_w
      |FROM r$Iters r
      |LEFT JOIN inw i ON r.node = i.node
      |LEFT JOIN outw ou ON r.node = ou.node""".stripMargin),
    headline = true)

  /** Oracle CTE chain for one graph: synthesized edges (optionally
    * filtered) and the unrolled 4-round integer power iteration
    * (`<p>r0..<p>r4`), all relation names prefixed so chains over
    * different doc subsets compose in one statement. */
  private def graphChain(p: String, where: String): String = {
    val rounds = (1 to Iters).map(i => iterCte(s"${p}r${i - 1}", s"${p}r$i", p)).mkString(",\n")
    s"""${p}raw AS (
      |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M) AS dst
      |  FROM documents WHERE $where
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M)
      |  FROM documents WHERE $where
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M)
      |  FROM documents WHERE $where),
      |${p}e AS (SELECT src, dst, COUNT(*) AS w FROM ${p}raw
      |          WHERE src != dst GROUP BY src, dst),
      |${p}nodes AS (SELECT src AS node FROM ${p}e UNION SELECT dst FROM ${p}e),
      |${p}o AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wtot FROM ${p}e GROUP BY src),
      |${p}r0 AS (SELECT node, CAST($Scale // (SELECT COUNT(*) FROM ${p}nodes) AS BIGINT)
      |             AS rank FROM ${p}nodes),
      |$rounds""".stripMargin
  }

  /** Shared oracle prefix: the full-corpus link graph chain. */
  private lazy val linkGraphCtes: String = graphChain("", "TRUE")

  /** The same synthesized edge list, Spark side. */
  private def linkEdges(s: org.apache.spark.sql.SparkSession, d: String,
                        docFilter: org.apache.spark.sql.Column = lit(true)) =
    documents(s, d).select(col("doc_id")).filter(docFilter)
      .select(col("doc_id"), explode(array(
        (col("doc_id") * 7 + 13) % M,
        (col("doc_id") * 13 + 29) % M,
        (col("doc_id") * 31 + 7) % M)).as("t"))
      .select(concat(lit("d"), col("doc_id") % M).as("src"),
        concat(lit("d"), col("t")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(lcount(lit(1)).as("w"))

  /** q157: crawl-frontier budget allocation — the stage that turns the
    * domain-quality priors into a next-crawl plan: PageRank centrality
    * (q153's graph) blends with per-domain content density (mean token
    * count over the domain's docs, 1000-scaled) into an integer
    * priority, and a 1,000,000-page crawl budget allocates
    * proportionally (truncating division, so the allocation is
    * bit-exact on both engines). Output: the top 25 domains by
    * priority with their page budgets. */
  val q157 = GQuery(
    "q157_crawl_frontier",
    (s, d) => {
      val pr = PageRank.run(linkEdges(s, d), iters = Iters, scale = Scale)
      val tok = documents(s, d)
        .select(concat(lit("d"), col("doc_id") % M).as("node"),
          size(graft.text.TextFunctions.wsTokens(col("text"))).cast("long").as("n_tok"))
        .groupBy(col("node"))
        .agg(lcount(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_sum"))
      val pri = pr.join(tok, Seq("node"), "left")
        .select(col("node").as("domain"), col("rank").as("rank_e12"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          expr("CASE WHEN n_docs > 0 THEN (tok_sum * 1000) div n_docs ELSE 0 END")
            .as("tok_per_k"))
        .withColumn("priority", expr("(rank_e12 div 1000) * tok_per_k"))
      val total = pri.agg(sum(col("priority")).as("tp"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("priority").desc, col("domain"))
      pri.crossJoin(total)
        .withColumn("alloc", expr("(priority * 1000000) div tp"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 25)
        .drop("tp")
    },
    Some(s"""WITH $linkGraphCtes,
      |tok AS (
      |  SELECT 'd' || (doc_id % $M) AS node, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS tok_sum
      |  FROM documents GROUP BY 1),
      |pri AS (
      |  SELECT r.node AS domain, r.rank AS rank_e12,
      |    CAST(COALESCE(t.n_docs, 0) AS BIGINT) AS n_docs,
      |    CAST(CASE WHEN t.n_docs > 0 THEN (t.tok_sum * 1000) // t.n_docs ELSE 0 END
      |      AS BIGINT) AS tok_per_k
      |  FROM r$Iters r LEFT JOIN tok t ON r.node = t.node),
      |pri2 AS (
      |  SELECT *, (rank_e12 // 1000) * tok_per_k AS priority FROM pri),
      |fin AS (
      |  SELECT *,
      |    CAST((priority * 1000000) // (SELECT SUM(priority) FROM pri2) AS BIGINT)
      |      AS alloc,
      |    ROW_NUMBER() OVER (ORDER BY priority DESC, domain) AS rn
      |  FROM pri2)
      |SELECT domain, rank_e12, n_docs, tok_per_k, CAST(priority AS BIGINT) AS priority,
      |  alloc, CAST(rn AS BIGINT) AS rn
      |FROM fin WHERE rn <= 25""".stripMargin))

  /** q158: anchor-text aggregation — the web-graph signal retrieval
    * and quality classifiers consume per TARGET: every link carries
    * the linking doc's leading bigram as its anchor, and each target
    * domain keeps its top-3 anchors by link count (exact, ties to the
    * lexicographically-smaller anchor). The anchor census shuffles
    * once on (dst, anchor) and once on dst for the ranking window —
    * never on the raw link list. */
  val q158 = GQuery(
    "q158_anchor_text",
    (s, d) => {
      val anchors = documents(s, d)
        .select(col("doc_id"),
          array_join(slice(graft.text.TextFunctions.wsTokens(col("text")), 1, 2), " ")
            .as("anchor"))
        .select(col("doc_id"), col("anchor"), explode(array(
          (col("doc_id") * 7 + 13) % M,
          (col("doc_id") * 13 + 29) % M,
          (col("doc_id") * 31 + 7) % M)).as("t"))
        .select(concat(lit("d"), col("doc_id") % M).as("src"),
          concat(lit("d"), col("t")).as("dst"), col("anchor"))
        .filter(col("src") =!= col("dst"))
      val counts = anchors.groupBy(col("dst"), col("anchor"))
        .agg(lcount(lit(1)).as("n_links"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dst")).orderBy(col("n_links").desc, col("anchor"))
      counts.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("dst").as("domain"), col("rn"), col("anchor"), col("n_links"))
    },
    Some(s"""WITH a AS (
      |  SELECT doc_id,
      |    array_to_string(string_split_regex(trim(text), '\\s+')[1:2], ' ') AS anchor
      |  FROM documents),
      |l AS (
      |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M) AS dst,
      |    anchor FROM a
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M), anchor FROM a
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M), anchor FROM a),
      |c AS (
      |  SELECT dst, anchor, COUNT(*) AS n_links FROM l
      |  WHERE src != dst GROUP BY dst, anchor),
      |r AS (
      |  SELECT dst, anchor, n_links,
      |    ROW_NUMBER() OVER (PARTITION BY dst ORDER BY n_links DESC, anchor) AS rn
      |  FROM c)
      |SELECT dst AS domain, CAST(rn AS BIGINT) AS rn, anchor, n_links
      |FROM r WHERE rn <= 3""".stripMargin))

  /** q160: incremental PageRank — the 100 TB maintenance path: the
    * LANDED graph's converged ranks ([[PageRank.run]] on docs with
    * `doc_id % 3 != 0`) warm-start ONE round over the full graph after
    * the batch's edges land ([[PageRank.continueFrom]]), instead of
    * re-iterating from uniform. Output per domain: the warm-start
    * input rank, the post-round rank, and the drift the edge batch
    * caused. The oracle runs BOTH chains (landed r0..r4, then the
    * warm round over the full graph) — the warm-start semantics
    * themselves are hash-gated. */
  val q160 = GQuery(
    "q160_pagerank_incremental",
    (s, d) => {
      val landedRanks = PageRank.run(
        linkEdges(s, d, col("doc_id") % 3 =!= 0), iters = Iters, scale = Scale)
      val fullE = linkEdges(s, d)
      val nodes = fullE.select(col("src").as("node"))
        .union(fullE.select(col("dst").as("node"))).distinct()
      val nU = nodes.count()
      val prev = nodes
        .join(landedRanks.withColumnRenamed("rank", "__lr"), Seq("node"), "left")
        .select(col("node"), coalesce(col("__lr"), lit(Scale / nU)).as("rank_prev"))
      val warm = PageRank.continueFrom(fullE, landedRanks, iters = 1, scale = Scale)
        .withColumnRenamed("rank", "rank_warm")
      prev.join(warm, Seq("node"))
        .select(col("node").as("domain"), col("rank_prev"), col("rank_warm"),
          (col("rank_warm") - col("rank_prev")).as("drift"))
    },
    Some(s"""WITH $linkGraphCtes,
      |${graphChain("l_", "doc_id % 3 != 0")},
      |w0 AS (
      |  SELECT n.node, COALESCE(lr.rank,
      |    CAST($Scale // (SELECT COUNT(*) FROM nodes) AS BIGINT)) AS rank
      |  FROM nodes n LEFT JOIN l_r$Iters lr ON n.node = lr.node),
      |${iterCte("w0", "w1", "")}
      |SELECT w0.node AS domain, w0.rank AS rank_prev, w1.rank AS rank_warm,
      |  w1.rank - w0.rank AS drift
      |FROM w0 JOIN w1 ON w0.node = w1.node""".stripMargin))

  /** One HITS round as oracle CTEs: hub mass flows down edges onto dst
    * (authority update, L1-renormalized to [[Scale]] with the same
    * DECIMAL/HUGEINT truncating division the engine uses), then the
    * new authorities flow back up onto src (hub update). */
  private def hitsRound(k: Int): String = {
    val (prev, a, ar, br, cur) = (s"h${k - 1}", s"a$k", s"a${k}r", s"b${k}r", s"h$k")
    // AS MATERIALIZED: each CTE is referenced 2-3 times per round;
    // inlined expansion would grow exponentially over the rounds (and
    // exhaust file handles re-opening the parquet leaves)
    s"""$ar AS MATERIALIZED (
       |  SELECT e.dst AS node, SUM(CAST($prev.hub AS HUGEINT) * e.w) AS raw
       |  FROM e JOIN $prev ON e.src = $prev.node GROUP BY e.dst),
       |$a AS MATERIALIZED (
       |  SELECT n.node,
       |    CAST(COALESCE((CAST(COALESCE(r.raw, 0) AS HUGEINT) * $Scale)
       |      // NULLIF((SELECT SUM(raw) FROM $ar), 0), 0) AS BIGINT) AS auth
       |  FROM nodes n LEFT JOIN $ar r ON n.node = r.node),
       |$br AS MATERIALIZED (
       |  SELECT e.src AS node, SUM(CAST($a.auth AS HUGEINT) * e.w) AS raw
       |  FROM e JOIN $a ON e.dst = $a.node GROUP BY e.src),
       |$cur AS MATERIALIZED (
       |  SELECT n.node, $a.auth,
       |    CAST(COALESCE((CAST(COALESCE(r.raw, 0) AS HUGEINT) * $Scale)
       |      // NULLIF((SELECT SUM(raw) FROM $br), 0), 0) AS BIGINT) AS hub
       |  FROM nodes n JOIN $a ON n.node = $a.node
       |  LEFT JOIN $br r ON n.node = r.node)""".stripMargin
  }

  private val HitsIters = 3

  /** q164: HITS hubs-and-authorities ([[graft.graph.Hits]]) over the
    * q153 link graph — the complementary centrality pair (authorities
    * = linked-to content worth keeping, hubs = link-collection pages a
    * frontier expands but a corpus drops). Three integer-exact rounds;
    * the oracle unrolls the identical L1-renormalized power iteration,
    * so the iteration dynamics sit under the hash gate exactly like
    * q153's PageRank. */
  val q164 = GQuery(
    "q164_hits_centrality",
    (s, d) => {
      graft.graph.Hits.run(linkEdges(s, d), iters = HitsIters, scale = Scale)
        .select(col("node").as("domain"),
          col("auth").as("auth_e12"), col("hub").as("hub_e12"))
    },
    Some(s"""WITH raw AS (
      |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M) AS dst
      |  FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M) FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M) FROM documents),
      |e AS MATERIALIZED (SELECT src, dst, COUNT(*) AS w FROM raw
      |      WHERE src != dst GROUP BY src, dst),
      |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |h0 AS MATERIALIZED (
      |  SELECT node,
      |    CAST($Scale // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS auth,
      |    CAST($Scale // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS hub
      |  FROM nodes),
      |${(1 to HitsIters).map(hitsRound).mkString(",\n")}
      |SELECT node AS domain, auth AS auth_e12, hub AS hub_e12
      |FROM h$HitsIters""".stripMargin))

  /** q174: label-propagation communities over the q153 link graph
    * ([[graft.graph.LabelProp]]) — the mirror/template-farm detector
    * that complements connected components (q57): 3 synchronous
    * rounds, votes weighted by undirected edge mass, ties broken
    * (weight DESC, label ASC). The oracle unrolls the same 3 rounds
    * as CTEs — the vote dynamics sit under the hash gate. Output: a
    * per-community census (size + member-id sum + smallest member). */
  val q174 = GQuery(
    "q174_label_communities",
    (s, d) => {
      val labels = graft.graph.LabelProp.run(linkEdges(s, d), iters = 3)
      labels.groupBy(col("label").as("community"))
        .agg(
          lcount(lit(1)).as("n_nodes"),
          sum(expr("CAST(substring(node, 2) AS BIGINT)")).as("id_sum"),
          min(col("node")).as("first_member"))
    },
    Some {
      def round(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT v.node, COALESCE(b.label, v.label) AS label
           |  FROM $prev v LEFT JOIN (
           |    SELECT node, label FROM (
           |      SELECT u.dst AS node, l.label, SUM(u.w) AS wsum,
           |        row_number() OVER (PARTITION BY u.dst
           |          ORDER BY SUM(u.w) DESC, l.label ASC) AS rn
           |      FROM u JOIN $prev l ON u.src = l.node
           |      GROUP BY u.dst, l.label) t WHERE rn = 1) b
           |  ON v.node = b.node)""".stripMargin
      s"""WITH raw AS (
        |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M) FROM documents
        |  UNION ALL
        |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M) FROM documents),
        |e0 AS (SELECT src, dst, COUNT(*) AS w FROM raw
        |       WHERE src != dst GROUP BY src, dst),
        |u AS MATERIALIZED (
        |  SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
        |    SELECT src, dst, w FROM e0
        |    UNION ALL SELECT dst, src, w FROM e0) GROUP BY src, dst),
        |l0 AS (SELECT DISTINCT src AS node, src AS label FROM u),
        |${round("l0", "l1")},
        |${round("l1", "l2")},
        |${round("l2", "l3")}
        |SELECT label AS community, COUNT(*) AS n_nodes,
        |  CAST(SUM(CAST(substr(node, 2) AS BIGINT)) AS BIGINT) AS id_sum,
        |  MIN(node) AS first_member
        |FROM l3 GROUP BY label""".stripMargin
    })

  /** q178: modularity audit of the q174 label-propagation communities
    * — the standard "is this partition better than chance" score
    * (Newman Q = Σ_c in_c/2m − (deg_c/2m)²), reported per community
    * so a curation run can see WHICH host families are real and which
    * are propagation noise. All masses are exact int64 on the doubled
    * undirected edge list (in_w double-counts like 2m does, so the
    * ratios are the textbook ones); the per-community contribution is
    * one double expression with identical operation order on both
    * engines, rounded at 6. */
  val q178 = GQuery(
    "q178_label_modularity",
    (s, d) => {
      val dir = linkEdges(s, d)
      val und = dir.select(col("src"), col("dst"), col("w"))
        .unionByName(dir.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
        .localCheckpoint(eager = false)
      val labels = graft.graph.LabelProp.run(dir, iters = 3)
        .localCheckpoint(eager = false)
      val la = labels.withColumnRenamed("node", "src").withColumnRenamed("label", "ca")
      val lb = labels.withColumnRenamed("node", "dst").withColumnRenamed("label", "cb")
      val joined = und.join(la, "src").join(lb, "dst")
        .localCheckpoint(eager = false) // two consumers: per-community masses + 2m
      // 2m as a broadcast 1-row frame, never a driver collect
      val m2f = joined.agg(sum(col("w")).as("m2"))
      val perC = joined.groupBy(col("ca").as("community"))
        .agg(
          sum(when(col("ca") === col("cb"), col("w")).otherwise(lit(0L))).as("in_w"),
          sum(col("w")).as("deg_w"))
      val sizes = labels.groupBy(col("label").as("community"))
        .agg(lcount(lit(1)).as("n_nodes"))
      val m2d = col("m2").cast("double")
      perC.join(sizes, Seq("community"))
        .crossJoin(broadcast(m2f))
        .select(col("community"), col("n_nodes"), col("in_w"), col("deg_w"),
          round(col("in_w").cast("double") / m2d
            - (col("deg_w").cast("double") / m2d)
              * (col("deg_w").cast("double") / m2d), 6)
            .as("q_contrib"))
    },
    Some {
      def round2(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT v.node, COALESCE(b.label, v.label) AS label
           |  FROM $prev v LEFT JOIN (
           |    SELECT node, label FROM (
           |      SELECT u.dst AS node, l.label, SUM(u.w) AS wsum,
           |        row_number() OVER (PARTITION BY u.dst
           |          ORDER BY SUM(u.w) DESC, l.label ASC) AS rn
           |      FROM u JOIN $prev l ON u.src = l.node
           |      GROUP BY u.dst, l.label) t WHERE rn = 1) b
           |  ON v.node = b.node)""".stripMargin
      s"""WITH raw AS (
        |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M) FROM documents
        |  UNION ALL
        |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M) FROM documents),
        |e0 AS (SELECT src, dst, COUNT(*) AS w FROM raw
        |       WHERE src != dst GROUP BY src, dst),
        |u AS MATERIALIZED (
        |  SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
        |    SELECT src, dst, w FROM e0
        |    UNION ALL SELECT dst, src, w FROM e0) GROUP BY src, dst),
        |l0 AS (SELECT DISTINCT src AS node, src AS label FROM u),
        |${round2("l0", "l1")},
        |${round2("l1", "l2")},
        |${round2("l2", "l3")},
        |j AS (
        |  SELECT a.label AS community, b.label AS cb, u.w
        |  FROM u JOIN l3 a ON u.src = a.node JOIN l3 b ON u.dst = b.node),
        |m2 AS (SELECT CAST(SUM(w) AS BIGINT) AS m2 FROM j),
        |pc AS (
        |  SELECT community,
        |    CAST(SUM(CASE WHEN community = cb THEN w ELSE 0 END) AS BIGINT) AS in_w,
        |    CAST(SUM(w) AS BIGINT) AS deg_w
        |  FROM j GROUP BY community),
        |sz AS (SELECT label AS community, COUNT(*) AS n_nodes FROM l3 GROUP BY label)
        |SELECT pc.community, sz.n_nodes, pc.in_w, pc.deg_w,
        |  round(CAST(pc.in_w AS DOUBLE) / CAST(m2.m2 AS DOUBLE)
        |    - (CAST(pc.deg_w AS DOUBLE) / CAST(m2.m2 AS DOUBLE))
        |      * (CAST(pc.deg_w AS DOUBLE) / CAST(m2.m2 AS DOUBLE)), 6) AS q_contrib
        |FROM pc JOIN sz ON pc.community = sz.community CROSS JOIN m2""".stripMargin
    })

  /** q231: reply-thread linearization by pointer jumping
    * ([[graft.graph.PointerJump]], Wyllie's list ranking) — the
    * forum/chat preprocessing step that turns reply-to edges into
    * training sequences: every event resolves to its thread root,
    * depth, and the md5 of its full root-ward id path, in ⌈log₂ d⌉
    * self-joins instead of d sequential ones. The fixture builds
    * both pathological shapes from the event log: even threads are
    * pure 50-deep chains (doubling's worst case), odd threads are
    * binary trees (fan-in). The oracle replays the walk as a
    * recursive CTE, so every path byte is under the hash. */
  /** The (node, root, depth, path) walk both thread queries share:
    * q231 LANDS it ([[graft.core.Landed]] — the build stays in q231's
    * timed window), q232 PROBES the landing instead of re-running the
    * ⌈log₂ d⌉ join rounds. Key carries the data dir: the bench warms
    * at sf0.001 and measures at sf0.1. */
  private def threadPathsBuild(s: org.apache.spark.sql.SparkSession,
                               d: String): org.apache.spark.sql.DataFrame = {
    val local = col("event_id") % 50
    val tid = floor(col("event_id") / 50).cast("long")
    val parent = when(local === 0, lit(null).cast("long"))
      .otherwise(when(tid % 2 === 0, col("event_id") - 1)
        .otherwise(tid * 50 + floor((local - 1) / 2).cast("long")))
    graft.graph.PointerJump.linearize(
      events(s, d).select(col("event_id"), parent.as("parent")),
      "event_id", "parent", depthHint = Some(50)) // chain threads: depth 49
  }

  val q231 = GQuery(
    "q231_thread_linearize",
    (s, d) =>
      graft.core.Landed.land(s, s"thread-paths:$d")(threadPathsBuild(s, d))
        .select(col("node").as("event_id"), col("root").as("root_id"),
          col("depth"), md5(col("path")).as("path_md5")),
    Some("""WITH RECURSIVE ev AS (
      |  SELECT event_id AS node,
      |    CASE WHEN event_id % 50 = 0 THEN NULL
      |         WHEN (event_id // 50) % 2 = 0 THEN event_id - 1
      |         ELSE (event_id // 50) * 50 + (event_id % 50 - 1) // 2
      |    END AS parent
      |  FROM events),
      |walk AS (
      |  SELECT node, node AS cur, CAST(node AS VARCHAR) AS path,
      |    0 AS depth, parent AS nxt FROM ev
      |  UNION ALL
      |  SELECT w.node, e.node, w.path || ',' || CAST(e.node AS VARCHAR),
      |    w.depth + 1, e.parent
      |  FROM walk w JOIN ev e ON w.nxt = e.node)
      |SELECT node AS event_id, cur AS root_id, CAST(depth AS BIGINT) AS depth,
      |  md5(path) AS path_md5
      |FROM walk WHERE nxt IS NULL""".stripMargin),
    headline = true)

  /** q232: thread-aware SFT context assembly — the load-bearing use
    * of q231's paths: each reply's training context is its ancestor
    * turns in ROOT→NODE order. The walk is PROBED from q231's landed
    * artifact ([[graft.core.Landed]] — the q88/q229 landed-index
    * discipline applied to the one pair that recomputed a shared
    * index), so only the assembly runs here: the path explodes to
    * (node, pos, turn id), turn text joins from the documents table
    * (doc_id = id mod corpus size, both engines derive the modulus
    * from the data), and the context reassembles with array_sort —
    * the same explode-join-reassemble shape as the CDC chunker, no
    * window, no collect. Hash covers the md5 of every assembled
    * context string. */
  val q232 = GQuery(
    "q232_thread_sft",
    (s, d) => {
      graft.functions.ThreadCtx.register(s)
      val lin = graft.core.Landed.probeOrBuild(s, s"thread-paths:$d")(
        threadPathsBuild(s, d))
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      val nDocs = docs.agg(count(lit(1)).as("__c"))
      // contexts are prefix chains, so they are hashed thread-locally
      // by the streaming-md5 thread_ctx kernel: each turn's TEXT
      // shuffles once (to its thread), its CONTEXT never materializes.
      // parent = 2nd path element (the landed path is node→…→root).
      val parent = when(col("depth") === 0, lit(null).cast("long"))
        .otherwise(element_at(split(col("path"), ","), 2).cast("long"))
      lin.crossJoin(broadcast(nDocs))
        .join(docs, col("doc_id") === col("node") % col("__c"))
        .groupBy(col("root"))
        .agg(collect_list(
          struct(col("node"), parent.as("parent"), col("text"))).as("turns"))
        .select(explode(call_function("thread_ctx", col("turns"))).as("r"))
        .select(col("r.node").as("event_id"), col("r.n_turns"),
          col("r.context_chars"), col("r.context_md5"))
    },
    Some("""WITH RECURSIVE ev AS (
      |  SELECT event_id AS node,
      |    CASE WHEN event_id % 50 = 0 THEN NULL
      |         WHEN (event_id // 50) % 2 = 0 THEN event_id - 1
      |         ELSE (event_id // 50) * 50 + (event_id % 50 - 1) // 2
      |    END AS parent
      |  FROM events),
      |c AS (SELECT COUNT(*) AS n FROM documents),
      |walk AS (
      |  SELECT node, node AS cur,
      |    (SELECT text FROM documents, c WHERE doc_id = node % c.n) AS ctx,
      |    0 AS depth, parent AS nxt FROM ev
      |  UNION ALL
      |  SELECT w.node, e.node,
      |    (SELECT text FROM documents, c WHERE doc_id = e.node % c.n)
      |      || chr(10) || w.ctx,
      |    w.depth + 1, e.parent
      |  FROM walk w JOIN ev e ON w.nxt = e.node)
      |SELECT node AS event_id, CAST(depth + 1 AS BIGINT) AS n_turns,
      |  CAST(length(ctx) AS BIGINT) AS context_chars,
      |  md5(ctx) AS context_md5
      |FROM walk WHERE nxt IS NULL""".stripMargin))

  /** q241: random-walk corpus over the link graph
    * ([[graft.graph.RandomWalks]]) — the DeepWalk/node2vec data-gen
    * step: one 8-hop walk per domain node, next hops drawn by md5 over
    * the sorted neighbor list, so the entire walk corpus replays
    * bit-for-bit (every PATH byte under the hash via the recursive-CTE
    * oracle). Eight equi-join rounds over the |nodes| frontier, fresh-
    * stats checkpoints per round; no driver-side graph. */
  val q241 = GQuery(
    "q241_random_walks",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"))
      val e = docs
        .select(col("doc_id"), explode(array(
          (col("doc_id") * 7 + 13) % M,
          (col("doc_id") * 13 + 29) % M,
          (col("doc_id") * 31 + 7) % M)).as("t"))
        .select(concat(lit("d"), col("doc_id") % M).as("src"),
          concat(lit("d"), col("t")).as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.graph.RandomWalks.walks(e, "src", "dst", steps = 8, salt = "rw")
    },
    Some(s"""WITH RECURSIVE raw AS (
      |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M) AS dst
      |  FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M)
      |  FROM documents),
      |ed AS (SELECT DISTINCT src, dst FROM raw WHERE src != dst),
      |nb AS (SELECT src AS cur, list_sort(list(dst)) AS nbrs
      |       FROM ed GROUP BY src),
      |-- NOT a bare UNION: under WITH RECURSIVE DuckDB parses a CTE's
      |-- UNION as anchor/step and skips the dedup (measured: 594 rows)
      |nodes AS (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed) t),
      |wk AS (
      |  SELECT node AS walk, node AS cur, CAST(node AS VARCHAR) AS path,
      |    0 AS step
      |  FROM nodes
      |  UNION ALL
      |  SELECT w.walk,
      |    CASE WHEN n.nbrs IS NULL THEN w.cur
      |      ELSE n.nbrs[CAST(CAST(('0x' || substr(md5('rw-' || w.walk || '-'
      |        || (w.step + 1)), 1, 7)) AS BIGINT) % len(n.nbrs) + 1 AS INT)]
      |    END,
      |    w.path || ',' ||
      |    CASE WHEN n.nbrs IS NULL THEN w.cur
      |      ELSE n.nbrs[CAST(CAST(('0x' || substr(md5('rw-' || w.walk || '-'
      |        || (w.step + 1)), 1, 7)) AS BIGINT) % len(n.nbrs) + 1 AS INT)]
      |    END,
      |    w.step + 1
      |  FROM wk w LEFT JOIN nb n ON w.cur = n.cur
      |  WHERE w.step < 8)
      |SELECT walk, cur AS end_node, path FROM wk WHERE step = 8""".stripMargin))

  /** q242: skip-gram pair extraction from the walk corpus — the
    * load-bearing use of q241 (the q232-for-q231 pattern): a node2vec
    * trainer consumes (center, context) pairs within a ±2 window over
    * each walk. Paths explode to positions, the window pairs via one
    * walk-keyed self-join with a bounded offset predicate, and the
    * census is one shuffle on the pair key. Every pair count under the
    * hash. */
  val q242 = GQuery(
    "q242_skipgram_pairs",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"))
      val e = docs
        .select(col("doc_id"), explode(array(
          (col("doc_id") * 7 + 13) % M,
          (col("doc_id") * 13 + 29) % M,
          (col("doc_id") * 31 + 7) % M)).as("t"))
        .select(concat(lit("d"), col("doc_id") % M).as("src"),
          concat(lit("d"), col("t")).as("dst"))
        .filter(col("src") =!= col("dst"))
      val pos = graft.graph.RandomWalks
        .walks(e, "src", "dst", steps = 8, salt = "rw")
        .select(col("walk"), posexplode(split(col("path"), ",")).as(Seq("i", "node")))
        .localCheckpoint(eager = false) // both sides of the window join
      pos.select(col("walk"), col("i"), col("node").as("center"))
        .join(pos.select(col("walk"), col("i").as("j"), col("node").as("context")),
          Seq("walk"))
        .filter(col("j") =!= col("i") && abs(col("j") - col("i")) <= 2)
        .groupBy(col("center"), col("context"))
        .agg(lcount(lit(1)).as("n_pairs"))
    },
    Some(s"""WITH RECURSIVE raw AS (
      |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M) AS dst
      |  FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M)
      |  FROM documents),
      |ed AS (SELECT DISTINCT src, dst FROM raw WHERE src != dst),
      |nb AS (SELECT src AS cur, list_sort(list(dst)) AS nbrs
      |       FROM ed GROUP BY src),
      |nodes AS (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed) t),
      |wk AS (
      |  SELECT node AS walk, node AS cur, CAST(node AS VARCHAR) AS path,
      |    0 AS step
      |  FROM nodes
      |  UNION ALL
      |  SELECT w.walk,
      |    CASE WHEN n.nbrs IS NULL THEN w.cur
      |      ELSE n.nbrs[CAST(CAST(('0x' || substr(md5('rw-' || w.walk || '-'
      |        || (w.step + 1)), 1, 7)) AS BIGINT) % len(n.nbrs) + 1 AS INT)]
      |    END,
      |    w.path || ',' ||
      |    CASE WHEN n.nbrs IS NULL THEN w.cur
      |      ELSE n.nbrs[CAST(CAST(('0x' || substr(md5('rw-' || w.walk || '-'
      |        || (w.step + 1)), 1, 7)) AS BIGINT) % len(n.nbrs) + 1 AS INT)]
      |    END,
      |    w.step + 1
      |  FROM wk w LEFT JOIN nb n ON w.cur = n.cur
      |  WHERE w.step < 8),
      |pos AS (
      |  SELECT walk, CAST(u.i - 1 AS INTEGER) AS i, sp[u.i] AS node
      |  FROM (SELECT walk, string_split(path, ',') AS sp
      |        FROM wk WHERE step = 8) t,
      |    UNNEST(generate_series(1, len(sp))) AS u(i))
      |SELECT a.node AS center, b.node AS context,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs
      |FROM pos a JOIN pos b ON a.walk = b.walk
      |  AND a.i <> b.i AND abs(b.i - a.i) <= 2
      |GROUP BY 1, 2""".stripMargin))

  /** q243: negative sampling for the skip-gram pairs — the third leg
    * of the word2vec preprocessing trio (q241 walks → q242 pairs →
    * noise draws): two negatives per pair from the context-frequency^
    * 0.75 noise distribution (Mikolov NeurIPS'13). Every draw is an
    * md5 integer mapped through the cumulative mass table (bounded —
    * one row per node — so the lookup is a broadcast range join), and
    * the ¾ power is spelled sqrt(sqrt(c³)): sqrt is IEEE
    * correctly-rounded on every engine where pow is not, so the mass
    * table is bit-identical by construction, not by luck. */
  val q243 = GQuery(
    "q243_negative_samples",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"))
      val e = docs
        .select(col("doc_id"), explode(array(
          (col("doc_id") * 7 + 13) % M,
          (col("doc_id") * 13 + 29) % M,
          (col("doc_id") * 31 + 7) % M)).as("t"))
        .select(concat(lit("d"), col("doc_id") % M).as("src"),
          concat(lit("d"), col("t")).as("dst"))
        .filter(col("src") =!= col("dst"))
      val pos = graft.graph.RandomWalks
        .walks(e, "src", "dst", steps = 8, salt = "rw")
        .select(col("walk"), posexplode(split(col("path"), ",")).as(Seq("i", "node")))
        .localCheckpoint(eager = false)
      val pairs = pos.select(col("walk"), col("i"), col("node").as("center"))
        .join(pos.select(col("walk"), col("i").as("j"), col("node").as("context")),
          Seq("walk"))
        .filter(col("j") =!= col("i") && abs(col("j") - col("i")) <= 2)
        .groupBy(col("center"), col("context"))
        .agg(lcount(lit(1)).as("n_pairs"))
        .localCheckpoint(eager = false) // noise census + draw side
      // noise mass per node: floor(sqrt(sqrt(c^3)) * 1e6 + .5), c =
      // context occurrences; cumulative over the BOUNDED node table
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("context")) // 101 rows — bounded single-reducer, fine
      val noise = pairs.groupBy(col("context"))
        .agg(sum(col("n_pairs")).as("c"))
        .withColumn("m", floor(sqrt(sqrt((col("c") * col("c") * col("c"))
          .cast("double"))) * 1e6 + 0.5).cast("long"))
        .withColumn("hi", sum(col("m")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .withColumn("lo", col("hi") - col("m"))
        .select(col("context").as("neg"), col("lo"), col("hi"))
        .localCheckpoint(eager = false) // total + broadcast lookup
      val total = noise.agg(max(col("hi")).as("tot"))
      val draws = pairs.select(col("center"), col("context"))
        .crossJoin(broadcast(
          s.createDataset(Seq(1, 2))(org.apache.spark.sql.Encoders.scalaInt)
            .toDF("j")))
        .crossJoin(broadcast(total))
        .withColumn("u",
          conv(substring(md5(concat_ws("-", lit("neg"), col("center"),
            col("context"), col("j").cast("string"))), 1, 12), 16, 10)
            .cast("long") % col("tot"))
      draws.join(broadcast(noise),
          col("u") >= col("lo") && col("u") < col("hi"))
        .select(col("center"), col("context"), col("j"), col("neg"))
    },
    Some(s"""WITH RECURSIVE raw AS (
      |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M) AS dst
      |  FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M)
      |  FROM documents),
      |ed AS (SELECT DISTINCT src, dst FROM raw WHERE src != dst),
      |nb AS (SELECT src AS cur, list_sort(list(dst)) AS nbrs
      |       FROM ed GROUP BY src),
      |nodes AS (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed) t),
      |wk AS (
      |  SELECT node AS walk, node AS cur, CAST(node AS VARCHAR) AS path,
      |    0 AS step
      |  FROM nodes
      |  UNION ALL
      |  SELECT w.walk,
      |    CASE WHEN n.nbrs IS NULL THEN w.cur
      |      ELSE n.nbrs[CAST(CAST(('0x' || substr(md5('rw-' || w.walk || '-'
      |        || (w.step + 1)), 1, 7)) AS BIGINT) % len(n.nbrs) + 1 AS INT)]
      |    END,
      |    w.path || ',' ||
      |    CASE WHEN n.nbrs IS NULL THEN w.cur
      |      ELSE n.nbrs[CAST(CAST(('0x' || substr(md5('rw-' || w.walk || '-'
      |        || (w.step + 1)), 1, 7)) AS BIGINT) % len(n.nbrs) + 1 AS INT)]
      |    END,
      |    w.step + 1
      |  FROM wk w LEFT JOIN nb n ON w.cur = n.cur
      |  WHERE w.step < 8),
      |pos AS (
      |  SELECT walk, CAST(u.i - 1 AS INTEGER) AS i, sp[u.i] AS node
      |  FROM (SELECT walk, string_split(path, ',') AS sp
      |        FROM wk WHERE step = 8) t,
      |    UNNEST(generate_series(1, len(sp))) AS u(i)),
      |pairs AS (
      |  SELECT a.node AS center, b.node AS context,
      |    CAST(COUNT(*) AS BIGINT) AS n_pairs
      |  FROM pos a JOIN pos b ON a.walk = b.walk
      |    AND a.i <> b.i AND abs(b.i - a.i) <= 2
      |  GROUP BY 1, 2),
      |noise AS (
      |  SELECT context AS neg,
      |    CAST(floor(sqrt(sqrt(CAST(c * c * c AS DOUBLE))) * 1e6 + 0.5)
      |      AS BIGINT) AS m
      |  FROM (SELECT context, CAST(SUM(n_pairs) AS BIGINT) AS c
      |        FROM pairs GROUP BY context) t),
      |cum AS (
      |  SELECT neg, SUM(m) OVER (ORDER BY neg
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m AS lo,
      |    SUM(m) OVER (ORDER BY neg
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      |  FROM noise),
      |tot AS (SELECT MAX(hi) AS tot FROM cum),
      |draws AS (
      |  SELECT p.center, p.context, jj.j,
      |    CAST(('0x' || substr(md5('neg-' || p.center || '-' || p.context
      |      || '-' || jj.j), 1, 12)) AS BIGINT) % t.tot AS u
      |  FROM pairs p, (VALUES (1), (2)) AS jj(j), tot t)
      |SELECT d.center, d.context, d.j, c.neg
      |FROM draws d JOIN cum c ON d.u >= c.lo AND d.u < c.hi""".stripMargin))

  /** k-core decomposition by iterated H-index (Lü et al. 2016) over
    * the undirected doc link graph — the "is this page inside a dense
    * link community or a tendril" signal a crawl-quality gate adds to
    * PageRank (q153) and triangle count (q206). Six H-index rounds
    * converge on this graph (KCoreSpec pins round-6 ≡ round-8); the
    * update is integer-valued and tie-invariant (MAX(LEAST(rank,
    * value)) over desc-sorted neighbour values), so the oracle unrolls
    * the same rounds as CTEs and the whole iteration sits under the
    * hash gate. */
  val q259 = GQuery(
    "q259_kcore_decomposition",
    (s, d) =>
      graft.graph.KCore.coreness(linkEdges(s, d).drop("w"), iters = 6),
    Some {
      def round(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT src AS node, MAX(LEAST(rn, c)) AS c FROM (
           |    SELECT u.src, cp.c,
           |      row_number() OVER (PARTITION BY u.src ORDER BY cp.c DESC) AS rn
           |    FROM u JOIN $prev cp ON u.dst = cp.node)
           |  GROUP BY src)""".stripMargin
      s"""WITH raw AS (
        |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M) FROM documents
        |  UNION ALL
        |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M) FROM documents),
        |e0 AS (SELECT DISTINCT src, dst FROM raw WHERE src != dst),
        |u AS MATERIALIZED (
        |  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |c0 AS (SELECT src AS node, COUNT(*) AS c FROM u GROUP BY 1),
        |${round("c0", "c1")},
        |${round("c1", "c2")},
        |${round("c2", "c3")},
        |${round("c3", "c4")},
        |${round("c4", "c5")},
        |${round("c5", "c6")}
        |SELECT d.node, CAST(d.c AS BIGINT) AS degree,
        |  CAST(k.c AS BIGINT) AS coreness
        |FROM c0 d JOIN c6 k ON d.node = k.node""".stripMargin
    })

  /** q267: TextRank keyword extraction (Mihalcea & Tarau 2004) — the
    * graph-based keyword signal beside the frequency ones (q32 counts,
    * q266 PMI): content words (length ≥ 4) vote for their neighbours
    * through the adjacency graph, and 4 damped power-iteration rounds
    * rank them. Nodes are `lang:word`, so all five per-language graphs
    * run as disconnected components of ONE [[graft.graph.PageRank]]
    * call (one shuffle per round total, not per language); the
    * integer-arithmetic iteration makes the dynamics bit-reproducible,
    * so the oracle unrolls the same rounds with the same truncating
    * divisions. Top-5 per language rides the TopKPerKey strategy. */
  val q267 = GQuery(
    "q267_textrank_keywords",
    (s, d) => {
      val ws0 = documents(s, d).select(col("lang"),
        filter(
          call_function("regexp_extract_all", col("text"), lit("[a-z]+"), lit(0)),
          w => length(w) >= 4).as("ws"))
      val pairs = ws0.select(col("lang"),
          explode(call_function("word_ngrams", col("ws"), lit(2), lit(false))).as("g"))
        .select(col("lang"),
          substring_index(col("g"), " ", 1).as("a"),
          substring_index(col("g"), " ", -1).as("b"))
      val raw = pairs.select(
          concat(col("lang"), lit(":"), col("a")).as("src"),
          concat(col("lang"), lit(":"), col("b")).as("dst"))
        .unionAll(pairs.select(
          concat(col("lang"), lit(":"), col("b")).as("src"),
          concat(col("lang"), lit(":"), col("a")).as("dst")))
      val edges = raw.filter(col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst")).agg(lcount(lit(1)).as("w"))
      // opt IN to the edge-frame checkpoint: deriving these edges
      // re-tokenizes the corpus, ~9× per run without it (6.1→1.6 s)
      val pr = PageRank.run(edges, iters = Iters, scale = Scale,
        checkpointEdges = true)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(substring_index(col("node"), ":", 1))
        .orderBy(col("rank").desc, col("node"))
      pr.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(substring_index(col("node"), ":", 1).as("lang"),
          col("rn"), substring_index(col("node"), ":", -1).as("word"),
          col("rank").as("rank_e12"))
    },
    Some {
      val rounds = (1 to Iters)
        .map(i => iterCte(s"kr${i - 1}", s"kr$i", "k")).mkString(",\n")
      s"""WITH kt AS (
        |  SELECT lang,
        |    list_filter(regexp_extract_all(text, '[a-z]+'),
        |      w -> length(w) >= 4) AS ws
        |  FROM documents),
        |kraw AS (
        |  SELECT lang || ':' || ws[i] AS src, lang || ':' || ws[i+1] AS dst
        |  FROM kt, UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)
        |  UNION ALL
        |  SELECT lang || ':' || ws[i+1], lang || ':' || ws[i]
        |  FROM kt, UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)),
        |ke AS (SELECT src, dst, COUNT(*) AS w FROM kraw
        |       WHERE src != dst GROUP BY src, dst),
        |knodes AS (SELECT src AS node FROM ke UNION SELECT dst FROM ke),
        |ko AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wtot FROM ke GROUP BY src),
        |kr0 AS (SELECT node, CAST($Scale // (SELECT COUNT(*) FROM knodes) AS BIGINT)
        |          AS rank FROM knodes),
        |$rounds,
        |fin AS (
        |  SELECT string_split(node, ':')[1] AS lang,
        |    string_split(node, ':')[2] AS word, rank AS rank_e12,
        |    ROW_NUMBER() OVER (PARTITION BY string_split(node, ':')[1]
        |      ORDER BY rank DESC, node) AS rn
        |  FROM kr$Iters)
        |SELECT lang, CAST(rn AS BIGINT) AS rn, word, rank_e12
        |FROM fin WHERE rn <= 5""".stripMargin
    })

  /** q270: k-truss peeling ([[graft.graph.KTruss]]) over the domain
    * link graph — the triangle-support cohesion filter beside q259's
    * degree-based k-core: an edge survives the 3-truss iff ≥ 1
    * triangle supports it among surviving edges, which keeps link-farm
    * near-cliques and drops organic star hubs (degree without
    * triangles). k = 3 because the synthetic graph's 4-truss is empty
    * (a 0-row fixture gates nothing); KTrussSpec exercises k = 4
    * peeling and the cascade on hand graphs. Three fixed peel rounds
    * (idempotent past the fixpoint), each round three equi-joins + one
    * count — the oracle unrolls the identical rounds, orientation, and
    * support filter. */
  val q270 = GQuery(
    "q270_ktruss",
    (s, d) =>
      graft.graph.KTruss.peel(linkEdges(s, d).drop("w"), "src", "dst",
        k = 3, rounds = 3),
    Some {
      def round(prev: String, cur: String) =
        s"""${cur}tri AS MATERIALIZED (
           |  SELECT e1.u, e1.v, e2.w
           |  FROM (SELECT lo AS u, hi AS v, dhi AS dv FROM $prev) e1
           |  JOIN (SELECT lo AS u, hi AS w, dhi AS dw FROM $prev) e2 USING (u)
           |  JOIN $prev p ON p.lo = e1.v AND p.hi = e2.w
           |  WHERE (e1.dv < e2.dw) OR (e1.dv = e2.dw AND e1.v < e2.w)),
           |${cur}sup AS (
           |  SELECT slo, shi, COUNT(*) AS support FROM (
           |    SELECT u AS slo, v AS shi FROM ${cur}tri
           |    UNION ALL SELECT u, w FROM ${cur}tri
           |    UNION ALL SELECT v, w FROM ${cur}tri)
           |  GROUP BY 1, 2),
           |$cur AS MATERIALIZED (
           |  SELECT p.lo, p.hi, p.dhi
           |  FROM $prev p JOIN ${cur}sup s ON p.lo = s.slo AND p.hi = s.shi
           |  WHERE s.support >= 1)""".stripMargin
      s"""WITH raw AS (
        |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M) FROM documents
        |  UNION ALL
        |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M) FROM documents),
        |e0 AS (SELECT DISTINCT src, dst FROM raw WHERE src != dst),
        |und AS (
        |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e0),
        |deg AS (
        |  SELECT node, COUNT(*) AS d FROM (
        |    SELECT a AS node FROM und UNION ALL SELECT b FROM und)
        |  GROUP BY 1),
        |t0 AS MATERIALIZED (
        |  SELECT
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
        |      THEN u.a ELSE u.b END AS lo,
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
        |      THEN u.b ELSE u.a END AS hi,
        |    CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
        |      THEN db.d ELSE da.d END AS dhi
        |  FROM und u
        |  JOIN deg da ON da.node = u.a JOIN deg db ON db.node = u.b),
        |${round("t0", "t1")},
        |${round("t1", "t2")},
        |${round("t2", "t3")}
        |SELECT LEAST(p.lo, p.hi) AS u, GREATEST(p.lo, p.hi) AS v,
        |  CAST(s.support AS BIGINT) AS support
        |FROM t3 p JOIN t3sup s ON p.lo = s.slo AND p.hi = s.shi""".stripMargin
    })

  /** q277: personalized PageRank ([[graft.graph.PageRank.personalized]],
    * Jeh & Widom 2003) from a 3-domain seed set — seed-anchored trust
    * propagation (TrustRank): restart mass and dangling mass land on
    * the seeds only, so ranks measure proximity to the seeds, the
    * related-domain expansion signal beside q153's global centrality.
    * Same integer rounds, oracle-unrolled with `CASE WHEN node IN
    * (seeds)` base terms; the unreferenced global-PR CTEs in the
    * shared chain cost nothing (DuckDB evaluates only reachable CTEs). */
  val q277 = GQuery(
    "q277_personalized_pagerank",
    (s, d) => {
      val seeds = Seq("d1", "d2", "d3")
      PageRank.personalized(linkEdges(s, d), seeds, iters = Iters, scale = Scale)
        .select(col("node").as("domain"), col("rank").as("rank_e12"),
          col("node").isin(seeds: _*).as("is_seed"))
    },
    Some {
      val seedsSql = "'d1', 'd2', 'd3'"
      val nSeeds = 3
      def pprCte(prev: String, cur: String) =
        s"""$cur AS (
           |  SELECT n.node,
           |    CAST(CASE WHEN n.node IN ($seedsSql)
           |        THEN (($Scale * 15) // 100) // $nSeeds ELSE 0 END
           |      + COALESCE(c.csum, 0)
           |      + CASE WHEN n.node IN ($seedsSql)
           |        THEN (((SELECT COALESCE(SUM(r.rank), 0) FROM $prev r
           |                WHERE r.node NOT IN (SELECT src FROM o)) * 85) // 100)
           |          // $nSeeds ELSE 0 END AS BIGINT) AS rank
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node,
           |      CAST(SUM((((r.rank * 85) // 100) * e.w) // o.wtot) AS BIGINT) AS csum
           |    FROM e JOIN $prev r ON e.src = r.node JOIN o ON e.src = o.src
           |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
      val rounds = (1 to Iters).map(i => pprCte(s"p${i - 1}", s"p$i")).mkString(",\n")
      s"""WITH $linkGraphCtes,
        |p0 AS (
        |  SELECT node, CAST(CASE WHEN node IN ($seedsSql)
        |    THEN $Scale // $nSeeds ELSE 0 END AS BIGINT) AS rank FROM nodes),
        |$rounds
        |SELECT node AS domain, rank AS rank_e12,
        |  node IN ($seedsSql) AS is_seed
        |FROM p$Iters""".stripMargin
    })

  /** q286: link-prediction census over the q153 link graph — the
    * crawl-frontier "which edges are probably missing" signal beside
    * the centrality family: for every candidate pair sharing ≥ 1
    * neighbor (postings self-join on the UNDIRECTED neighbor sets —
    * candidates come from shared neighbors, never an all-pairs cross),
    * common-neighbor count, preferential attachment d_a·d_b, and
    * neighborhood Jaccard (e6, truncating ÷ — engine-exact). Top-20 by
    * (cn, jaccard_e6, pair) — rank ties broken totally. */
  val q286 = GQuery(
    "q286_link_prediction",
    (s, d) => {
      val e = linkEdges(s, d)
      // undirected neighbor postings, one row per (node, neighbor)
      val post = e.select(col("src").as("node"), col("dst").as("nb"))
        .unionByName(e.select(col("dst").as("node"), col("src").as("nb")))
        .distinct()
        .localCheckpoint(eager = false) // pair sides + degree census
      val deg = post.groupBy(col("node")).agg(lcount(lit(1)).as("deg"))
      val cn = post.select(col("node").as("a"), col("nb"))
        .join(post.select(col("node").as("b"), col("nb")), Seq("nb"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(lcount(lit(1)).as("cn"))
      cn.join(broadcast(deg.select(col("node").as("a"), col("deg").as("da"))), Seq("a"))
        .join(broadcast(deg.select(col("node").as("b"), col("deg").as("db"))), Seq("b"))
        .select(col("a"), col("b"), col("cn"),
          (col("da") * col("db")).as("pa"),
          expr("(cn * 1000000) div (da + db - cn)").as("jaccard_e6"))
        .orderBy(col("cn").desc, col("jaccard_e6").desc, col("a"), col("b"))
        .limit(20)
    },
    Some(s"""WITH e AS MATERIALIZED (
      |  SELECT 'd' || CAST(doc_id % $M AS VARCHAR) AS src,
      |    'd' || CAST(t AS VARCHAR) AS dst
      |  FROM (SELECT doc_id, unnest([(doc_id * 7 + 13) % $M,
      |      (doc_id * 13 + 29) % $M, (doc_id * 31 + 7) % $M]) AS t
      |    FROM documents)
      |  WHERE 'd' || CAST(doc_id % $M AS VARCHAR) <> 'd' || CAST(t AS VARCHAR)),
      |post AS MATERIALIZED (
      |  SELECT DISTINCT src AS node, dst AS nb FROM e
      |  UNION SELECT DISTINCT dst AS node, src AS nb FROM e),
      |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM post GROUP BY node),
      |cn AS (
      |  SELECT x.node AS a, y.node AS b, CAST(COUNT(*) AS BIGINT) AS cn
      |  FROM post x JOIN post y ON x.nb = y.nb AND x.node < y.node
      |  GROUP BY 1, 2)
      |SELECT a, b, cn, da.deg * db.deg AS pa,
      |  (cn * 1000000) // (da.deg + db.deg - cn) AS jaccard_e6
      |FROM cn JOIN deg da ON cn.a = da.node JOIN deg db ON cn.b = db.node
      |ORDER BY cn DESC, jaccard_e6 DESC, a, b LIMIT 20""".stripMargin))

  /** q288: harmonic centrality (out-direction, horizon 4) over the
    * q153 link graph — the Common-Crawl-style centrality published
    * beside PageRank: harm(v) = Σ_{u: 0<d(v,u)≤4} ⌊10⁶/d(v,u)⌋, each
    * term a truncating integer ÷ so the score is engine-exact. The
    * distance table builds by 3 unrolled min-plus rounds over the
    * node-bounded pair frame (≤ M² rows — at 100 TB the same rounds
    * run over a domain graph, not the corpus), each round one
    * join + min-aggregate shuffle; the oracle replays the identical
    * rounds as MATERIALIZED CTEs. */
  val q288 = GQuery(
    "q288_harmonic_centrality",
    (s, d) => {
      val e = linkEdges(s, d).select(col("src"), col("dst"))
        .localCheckpoint(eager = false) // joined every round
      var dist = e.withColumn("dist", lit(1L))
      for (_ <- 2 to 4) {
        val ext = dist.join(
            e.select(col("src").as("dst"), col("dst").as("nxt")), Seq("dst"))
          .filter(col("src") =!= col("nxt"))
          .select(col("src"), col("nxt").as("dst"), (col("dist") + 1).as("dist"))
        dist = dist.unionByName(ext)
          .groupBy(col("src"), col("dst")).agg(min(col("dist")).as("dist"))
          .localCheckpoint(eager = true) // node²-bounded state per round
      }
      dist.groupBy(col("src").as("domain"))
        .agg(lcount(lit(1)).as("n_reached"),
          sum(expr("1000000 div dist")).as("harm_e6"))
        .orderBy(col("harm_e6").desc, col("domain"))
    },
    Some {
      def round(prev: String, out: String) =
        s"""$out AS MATERIALIZED (
           |  SELECT src, dst, MIN(dist) AS dist FROM (
           |    SELECT src, dst, dist FROM $prev
           |    UNION ALL
           |    SELECT p.src, e.dst, p.dist + 1 AS dist
           |    FROM $prev p JOIN e ON p.dst = e.src
           |    WHERE p.src <> e.dst)
           |  GROUP BY src, dst)"""
      s"""WITH e AS MATERIALIZED (
      |  SELECT DISTINCT 'd' || CAST(doc_id % $M AS VARCHAR) AS src,
      |    'd' || CAST(t AS VARCHAR) AS dst
      |  FROM (SELECT doc_id, unnest([(doc_id * 7 + 13) % $M,
      |      (doc_id * 13 + 29) % $M, (doc_id * 31 + 7) % $M]) AS t
      |    FROM documents)
      |  WHERE 'd' || CAST(doc_id % $M AS VARCHAR) <> 'd' || CAST(t AS VARCHAR)),
      |d1 AS MATERIALIZED (SELECT src, dst, 1 AS dist FROM e),
      |${round("d1", "d2")},
      |${round("d2", "d3")},
      |${round("d3", "d4")}
      |SELECT src AS domain, CAST(COUNT(*) AS BIGINT) AS n_reached,
      |  CAST(SUM(1000000 // dist) AS BIGINT) AS harm_e6
      |FROM d4 GROUP BY src
      |ORDER BY harm_e6 DESC, domain""".stripMargin
    })

  /** Oracle CTE block for one q330 chain variant: counts (optionally
    * with a channel removed), row-normalized matrix with absorbing
    * self-loops, five decimal-routed squarings (P^32), and the
    * start→conv absorption scalar. */
  private def markovCtes(tag: String, removed: String): String = {
    val cnt =
      if (removed.isEmpty) s"cnt_$tag AS (SELECT src, dst, n FROM cnt)"
      else
        s"""cnt_$tag AS (
           |  SELECT src, CASE WHEN dst = '$removed' THEN 'null' ELSE dst END
           |    AS dst, CAST(SUM(n) AS BIGINT) AS n
           |  FROM cnt WHERE src <> '$removed' GROUP BY 1, 2)""".stripMargin
    val m0 =
      s"""m_${tag}_0 AS (
         |  SELECT src, dst, CAST(n AS DOUBLE)
         |    / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE) AS p
         |  FROM cnt_$tag
         |  UNION ALL SELECT 'conv', 'conv', 1.0
         |  UNION ALL SELECT 'null', 'null', 1.0)""".stripMargin
    val sq = (1 to 5).map(k =>
      s"""m_${tag}_$k AS (
         |  SELECT a.src, b.dst,
         |    CAST(SUM(CAST(a.p * b.p AS DECIMAL(38,18))) AS DOUBLE) AS p
         |  FROM m_${tag}_${k - 1} a JOIN m_${tag}_${k - 1} b ON a.dst = b.src
         |  GROUP BY a.src, b.dst)""".stripMargin)
    val pc =
      s"""pc_$tag AS (
         |  SELECT COALESCE(SUM(p), 0.0) AS p FROM m_${tag}_5
         |  WHERE src = 'start' AND dst = 'conv')""".stripMargin
    (Seq(cnt, m0) ++ sq :+ pc).mkString(",\n")
  }

  /** q330: Markov-chain attribution with removal effects
    * ([[graft.graph.MarkovAttribution]], Anderl et al. 2014) — the
    * data-driven counterpart of q323's positional rules: journeys are
    * per-user event sequences truncated at the first purchase
    * (absorbing `conv`; journeys without one terminate in absorbing
    * `null`), and each channel's credit is how much the start→conv
    * absorption probability drops when the channel is removed (its
    * inbound traffic redirected to `null`). Absorption runs to a
    * 32-step horizon by FIVE matrix squarings — log₂ joins on
    * states²-bounded frames, every product-sum DECIMAL(38,18)-routed
    * so both engines agree bit-for-bit. One fact-sized pass builds
    * the transition counts (landed via localCheckpoint — five chain
    * variants probe it); everything after is a ≤49-row frame. */
  val q330 = GQuery(
    "q330_markov_attribution",
    (s, d) => {
      import graft.graph.{MarkovAttribution => MA}
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val o = events(s, d)
        .select(col("user_id"),
          when(col("event_type") === "purchase", lit("conv"))
            .otherwise(col("event_type")).as("st"),
          row_number().over(w).as("rn"))
      val fp = o.filter(col("st") === "conv")
        .groupBy(col("user_id")).agg(min(col("rn")).as("prn"))
      val j = o.join(fp, Seq("user_id"), "left")
        .filter(col("prn").isNull || col("rn") <= col("prn"))
      val w2 = W.partitionBy(col("user_id")).orderBy(col("rn"))
      val tr = j.select(
        coalesce(lag(col("st"), 1).over(w2), lit("start")).as("src"),
        col("st").as("dst"))
      val term = j
        .withColumn("rr", row_number().over(
          W.partitionBy(col("user_id")).orderBy(col("rn").desc)))
        .filter(col("rr") === 1 && col("st") =!= "conv")
        .select(col("st").as("src"), lit("null").as("dst"))
      val counts = tr.unionByName(term)
        .groupBy(col("src"), col("dst")).agg(lcount(lit(1)).as("n"))
        .localCheckpoint(eager = false) // five chain variants probe it
      val channels = Seq("click", "error", "signup", "view")
      // all five chains ride ONE tagged frame: each squaring is a
      // single job over the union instead of a job per variant
      val taggedCounts = (counts.withColumn("chain", lit("full")) +:
        channels.map(c =>
          MA.removeChannel(counts, c).withColumn("chain", lit(c))))
        .reduce(_ unionByName _)
      val pc = MA.absorption(MA.normalize(taggedCounts, Seq("chain")),
        squarings = 5, tagCols = Seq("chain"))
      val pf = pc.filter(col("chain") === "full").select(col("p").as("pf"))
      import s.implicits._
      val prs = channels.toDF("channel")
        .join(pc.withColumnRenamed("chain", "channel"), Seq("channel"), "left")
        .select(col("channel"), coalesce(col("p"), lit(0.0)).as("pr"))
      val dec18 = org.apache.spark.sql.types.DecimalType(38, 18)
      val re1 = prs.crossJoin(broadcast(pf))
        .select(col("channel"), col("pf"), col("pr"),
          when(col("pf") > 0, lit(1.0) - col("pr") / col("pf")).as("re"))
      val tot = re1.agg(sum(col("re").cast(dec18)).cast("double").as("sre"))
      re1.crossJoin(broadcast(tot))
        .select(col("channel"),
          round(col("pf"), 6).as("p_conv_full"),
          round(col("pr"), 6).as("p_conv_removed"),
          round(col("re"), 6).as("removal_effect"),
          when(col("sre") > 0, round(col("re") / col("sre"), 6)).as("share"))
        .orderBy(col("channel"))
    },
    Some(s"""WITH o AS (
      |  SELECT user_id,
      |    CASE WHEN event_type = 'purchase' THEN 'conv' ELSE event_type END
      |      AS st,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |fp AS (SELECT user_id, MIN(rn) AS prn FROM o WHERE st = 'conv'
      |  GROUP BY user_id),
      |j AS (SELECT o.user_id, o.st, o.rn FROM o
      |  LEFT JOIN fp ON o.user_id = fp.user_id
      |  WHERE fp.prn IS NULL OR o.rn <= fp.prn),
      |tr AS (SELECT COALESCE(LAG(st) OVER (PARTITION BY user_id ORDER BY rn),
      |    'start') AS src, st AS dst FROM j),
      |term AS (SELECT st AS src, 'null' AS dst FROM (
      |  SELECT user_id, st,
      |    row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rr
      |  FROM j) t WHERE rr = 1 AND st <> 'conv'),
      |cnt AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n FROM
      |  (SELECT src, dst FROM tr UNION ALL SELECT src, dst FROM term) u
      |  GROUP BY 1, 2),
      |${markovCtes("full", "")},
      |${markovCtes("click", "click")},
      |${markovCtes("error", "error")},
      |${markovCtes("signup", "signup")},
      |${markovCtes("view", "view")},
      |re0 AS (
      |  SELECT 'click' AS channel, f.p AS pf, r.p AS pr
      |  FROM pc_full f CROSS JOIN pc_click r
      |  UNION ALL SELECT 'error', f.p, r.p FROM pc_full f CROSS JOIN pc_error r
      |  UNION ALL SELECT 'signup', f.p, r.p
      |    FROM pc_full f CROSS JOIN pc_signup r
      |  UNION ALL SELECT 'view', f.p, r.p FROM pc_full f CROSS JOIN pc_view r),
      |re1 AS (SELECT channel, pf, pr,
      |  CASE WHEN pf > 0 THEN 1.0 - pr / pf END AS re FROM re0),
      |tot AS (SELECT CAST(SUM(CAST(re AS DECIMAL(38,18))) AS DOUBLE) AS sre
      |  FROM re1)
      |SELECT channel, round(pf, 6) AS p_conv_full,
      |  round(pr, 6) AS p_conv_removed, round(re, 6) AS removal_effect,
      |  CASE WHEN t.sre > 0 THEN round(re / t.sre, 6) END AS share
      |FROM re1 CROSS JOIN tot t ORDER BY channel""".stripMargin))

  /** q336: graph mixing census — degree assortativity (Newman 2002)
    * and edge reciprocity over the q153 domain graph, the structural
    * priors a crawl planner reads beside centrality (assortative
    * hub-to-hub linking vs disassortative hub-to-leaf; how much of
    * the link mass is mutual). Assortativity is the Pearson r over
    * edge-endpoint degree pairs on the symmetrized graph (each edge
    * counted in both orientations, the standard convention) with
    * EXACT integer moments — decimal-routed cross products, two
    * sqrts and one division at the very end. Reciprocity counts
    * directed edges whose reverse exists via one self-semi-join on
    * the edge key. Everything after the fact-sized edge build is
    * M²-bounded. */
  val q336 = GQuery(
    "q336_graph_mixing",
    (s, d) => {
      val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
      val e = linkEdges(s, d).localCheckpoint(eager = false)
      val sym = e.select(col("src").as("u"), col("dst").as("v"))
        .unionByName(e.select(col("dst").as("u"), col("src").as("v")))
        .distinct()
      val deg = sym.groupBy(col("u")).agg(lcount(lit(1)).as("k"))
      val pairs = sym
        .join(deg.select(col("u"), col("k").as("ku")), Seq("u"))
        .join(deg.select(col("u").as("v"), col("k").as("kv")), Seq("v"))
      val mom = pairs.agg(
        lcount(lit(1)).as("m"),
        sum(col("ku").cast(dec0)).as("sx"),
        sum((col("ku").cast(dec0)) * col("kv")).as("sxy"),
        sum((col("ku").cast(dec0)) * col("ku")).as("sxx"))
      val assort = mom.select(
        col("m"),
        when((col("m") * col("sxx") - col("sx") * col("sx")).cast("double") > 0,
          (col("m") * col("sxy") - col("sx") * col("sx")).cast("double")
            / (col("m") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("assortativity"))
      val recip = e.as("a").join(e.as("b"),
          col("a.src") === col("b.dst") && col("a.dst") === col("b.src"), "left_semi")
        .agg(lcount(lit(1)).as("n_mutual"))
      val nE = e.agg(lcount(lit(1)).as("n_edges"))
      assort.crossJoin(recip).crossJoin(nE)
        .select(col("n_edges"), col("n_mutual"),
          expr("m div 2").as("n_und_edges"),
          round(col("assortativity"), 6).as("assortativity"),
          round(col("n_mutual").cast("double") / col("n_edges").cast("double"), 6)
            .as("reciprocity"))
    },
    Some(s"""WITH raw AS (
      |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M)
      |    AS dst FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M)
      |  FROM documents),
      |e AS (SELECT src, dst, COUNT(*) AS w FROM raw WHERE src != dst
      |  GROUP BY src, dst),
      |sym AS (
      |  SELECT DISTINCT u, v FROM (
      |    SELECT src AS u, dst AS v FROM e
      |    UNION ALL SELECT dst, src FROM e) t),
      |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS k FROM sym GROUP BY u),
      |pairs AS (
      |  SELECT du.k AS ku, dv.k AS kv FROM sym s
      |  JOIN deg du ON s.u = du.u JOIN deg dv ON s.v = dv.u),
      |mom AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
      |    SUM(CAST(ku AS HUGEINT)) AS sx,
      |    SUM(CAST(ku AS HUGEINT) * kv) AS sxy,
      |    SUM(CAST(ku AS HUGEINT) * ku) AS sxx
      |  FROM pairs),
      |recip AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_mutual FROM e a
      |  WHERE EXISTS (SELECT 1 FROM e b
      |    WHERE a.src = b.dst AND a.dst = b.src)),
      |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
      |SELECT ne.n_edges, r.n_mutual, m.m // 2 AS n_und_edges,
      |  round(CASE WHEN CAST(m.m * m.sxx - m.sx * m.sx AS DOUBLE) > 0
      |    THEN CAST(m.m * m.sxy - m.sx * m.sx AS DOUBLE)
      |      / CAST(m.m * m.sxx - m.sx * m.sx AS DOUBLE) END, 6)
      |    AS assortativity,
      |  round(CAST(r.n_mutual AS DOUBLE) / CAST(ne.n_edges AS DOUBLE), 6)
      |    AS reciprocity
      |FROM mom m CROSS JOIN recip r CROSS JOIN ne""".stripMargin))

  /** q399: single-source shortest paths, 5 unrolled Bellman–Ford
    * relaxation rounds (Bellman 1958) — the distance member of the
    * graph family (components answer "connected?", PageRank "how
    * central?", this "how FAR?"): edge cost = 1000000 div w (strong
    * links are short — integer costs, so every distance is exact and
    * min-ties are value-identical), source = domain d0. Each round is
    * one edge⋈dist equi-join + a grouped min — the scalable
    * relax-all shape (at fact-sized graphs the same rounds shuffle on
    * node keys); output is the ≤5-hop reachable distance table. */
  val q399 = GQuery(
    "q399_shortest_paths",
    (s, d) => {
      val e = linkEdges(s, d)
        .select(col("src"), col("dst"),
          expr("CAST(1000000 div w AS BIGINT)").as("cost"))
        .localCheckpoint(eager = false)
      val d0 = e.select(lit("d0").as("node"), lit(0L).as("dist")).limit(1)
      val d5 = (1 to 5).foldLeft(d0) { (dist, _) =>
        val cand = e
          .join(dist.select(col("node").as("src"), col("dist")), Seq("src"))
          .select(col("dst").as("node"),
            (col("dist") + col("cost")).as("dist"))
        dist.unionByName(cand).groupBy(col("node"))
          .agg(min(col("dist")).as("dist"))
      }
      d5.select(col("node"), col("dist")).orderBy(col("node"))
    },
    Some {
      def step(prev: String, out: String) =
        s"""$out AS (
      |  SELECT node, MIN(dist) AS dist FROM (
      |    SELECT node, dist FROM $prev
      |    UNION ALL
      |    SELECT c.dst, p.dist + c.cost
      |    FROM c JOIN $prev p ON c.src = p.node)
      |  GROUP BY node)"""
      s"""WITH raw AS (
      |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M) AS dst
      |  FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M)
      |  FROM documents),
      |e AS (SELECT src, dst, COUNT(*) AS w FROM raw
      |      WHERE src != dst GROUP BY src, dst),
      |c AS (SELECT src, dst, CAST(1000000 // w AS BIGINT) AS cost FROM e),
      |dd0 AS (SELECT 'd0' AS node, CAST(0 AS BIGINT) AS dist),
      |${step("dd0", "dd1")},
      |${step("dd1", "dd2")},
      |${step("dd2", "dd3")},
      |${step("dd3", "dd4")},
      |${step("dd4", "dd5")}
      |SELECT node, CAST(dist AS BIGINT) AS dist
      |FROM dd5 ORDER BY node""".stripMargin
    })

  def queries: Seq[GQuery] =
    Seq(q153, q157, q158, q160, q164, q174, q178, q231, q232, q241, q242,
      q243, q259, q267, q270, q277, q286, q288, q330, q336, q399)
}
