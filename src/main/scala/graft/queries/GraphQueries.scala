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

  private def iterCte(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.node,
       |    CAST((($Scale * 15) // 100) // (SELECT COUNT(*) FROM nodes)
       |      + COALESCE(c.csum, 0)
       |      + (((SELECT COALESCE(SUM(r.rank), 0) FROM $prev r
       |           WHERE r.node NOT IN (SELECT src FROM o)) * 85) // 100)
       |        // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS rank
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS node,
       |      CAST(SUM((((r.rank * 85) // 100) * e.w) // o.wtot) AS BIGINT) AS csum
       |    FROM e JOIN $prev r ON e.src = r.node JOIN o ON e.src = o.src
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
    Some {
      val rounds = (1 to Iters).map(i => iterCte(s"r${i - 1}", s"r$i")).mkString(",\n")
      s"""WITH raw AS (
      |  SELECT 'd' || (doc_id % $M) AS src, 'd' || ((doc_id * 7 + 13) % $M) AS dst
      |  FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 13 + 29) % $M) FROM documents
      |  UNION ALL
      |  SELECT 'd' || (doc_id % $M), 'd' || ((doc_id * 31 + 7) % $M) FROM documents),
      |e AS (SELECT src, dst, COUNT(*) AS w FROM raw WHERE src != dst GROUP BY src, dst),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |o AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wtot FROM e GROUP BY src),
      |r0 AS (SELECT node, CAST($Scale // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS rank
      |       FROM nodes),
      |$rounds,
      |inw AS (SELECT dst AS node, CAST(SUM(w) AS BIGINT) AS in_w FROM e GROUP BY dst),
      |outw AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS out_w FROM e GROUP BY src)
      |SELECT r.node AS domain, r.rank AS rank_e12,
      |  COALESCE(i.in_w, 0) AS in_w, COALESCE(ou.out_w, 0) AS out_w
      |FROM r$Iters r
      |LEFT JOIN inw i ON r.node = i.node
      |LEFT JOIN outw ou ON r.node = ou.node""".stripMargin
    },
    headline = true)

  def queries: Seq[GQuery] = Seq(q153)
}
