package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted PageRank over a (src, dst, w) edge list — the link-graph
  * centrality signal web-scale curation pipelines attach to every
  * domain before content filtering (a crawl-frontier / source-quality
  * prior; same role as the harmonic-centrality ranks published with
  * Common Crawl). The reference pipeline has no link graph — this is
  * part of the training-data extension surface, upstream of the
  * domain-cap and URL-dedup stages (q143/q150/q151).
  *
  * Execution shape: each iteration is ONE shuffle — edges join the
  * current rank vector on `src` (both sides hash-partitioned by the
  * join key), contributions aggregate on `dst` with map-side partial
  * sums, and the dangling-mass correction is a 1-row scalar aggregate
  * cross-joined back (never collected). Rank state is a DataFrame of
  * (node, rank); per-round `localCheckpoint` cuts the doubling lineage
  * exactly like [[graft.dedup.Components.connected]]. Nothing is ever
  * driver-resident except the node count.
  *
  * Numerics: ranks live in integer units of `scale⁻¹` (default 1e-12)
  * and every step is int64 arithmetic — `(rank·dampNum div dampDen)·w
  * div wtot` — so partial sums are associative and the result is
  * bit-reproducible under any partitioning AND independently
  * derivable by the DuckDB oracle with the same truncating divisions
  * (IEEE-double power iteration would be order-dependent across a
  * shuffle). Overflow headroom: rank ≤ scale = 1e12, so
  * rank·dampNum ≤ 8.5e13 and contrib·w fits int64 for edge weights
  * up to ~1e5.
  */
object PageRank {

  /** Run `iters` damped power-iteration rounds over `edges` (columns
    * `src`, `dst`, `w`; self-loops and null endpoints dropped).
    * Returns (node, rank) with rank in units of 1/scale; total mass ≈
    * scale (truncating division sheds ≤ n units per round, identically
    * on the oracle side). Nodes = distinct endpoints; dangling nodes
    * (no out-edges) spread their damped mass uniformly. */
  def run(edges: DataFrame, iters: Int,
          scale: Long = 1000000000000L,
          dampNum: Long = 85, dampDen: Long = 100,
          checkpointEdges: Boolean = false): DataFrame =
    iterate(edges, None, iters, scale, dampNum, dampDen,
      checkpointEdges = checkpointEdges)

  /** Warm-start power iteration — the incremental-crawl path: when an
    * edge batch lands, ranks re-converge from the PREVIOUS rank vector
    * in a round or two instead of `iters` rounds from uniform (nodes
    * absent from `ranks0` — newly discovered — start at the uniform
    * share of the NEW node count). The warm start is the standard
    * approximation; what is NOT approximate is reproducibility: the
    * same integer arithmetic, so an oracle replays the warm rounds
    * exactly. */
  def continueFrom(edges: DataFrame, ranks0: DataFrame, iters: Int,
                   scale: Long = 1000000000000L,
                   dampNum: Long = 85, dampDen: Long = 100,
                   checkpointEdges: Boolean = false): DataFrame =
    iterate(edges, Some(ranks0), iters, scale, dampNum, dampDen,
      checkpointEdges = checkpointEdges)

  /** PERSONALIZED PageRank (random walk with restart, Jeh & Widom
    * 2003): the restart mass — the (1−d) teleport each round AND the
    * damped dangling mass — lands uniformly on the `seeds` set instead
    * of all nodes, so ranks measure proximity TO THE SEEDS (related-
    * domain expansion, seed-anchored trust propagation à la TrustRank)
    * rather than global centrality. Walk starts at the seeds
    * (rank₀ = scale/|seeds| on seeds, 0 elsewhere). Same integer
    * arithmetic and per-round shape as [[run]] — an oracle unrolls the
    * rounds with `CASE WHEN node IN (seeds)` base terms. Seeds absent
    * from the graph contribute nothing (their restart share is shed,
    * identically on both engines). Duplicate seeds are collapsed —
    * `isin` is set-semantics, so the restart divisor must be the
    * DISTINCT seed count or every seed's share silently shrinks. */
  def personalized(edges: DataFrame, seeds: Seq[String], iters: Int,
                   scale: Long = 1000000000000L,
                   dampNum: Long = 85, dampDen: Long = 100,
                   checkpointEdges: Boolean = false): DataFrame = {
    val ss = seeds.distinct
    require(ss.nonEmpty)
    iterate(edges, None, iters, scale, dampNum, dampDen,
      restart = Some(ss), checkpointEdges = checkpointEdges)
  }

  private def iterate(edges: DataFrame, ranks0: Option[DataFrame], iters: Int,
                      scale: Long, dampNum: Long, dampDen: Long,
                      restart: Option[Seq[String]] = None,
                      checkpointEdges: Boolean = false): DataFrame = {
    require(iters >= 1 && dampNum >= 0 && dampNum <= dampDen)
    // canonicalize: one row per (src, dst), weights summed — truncating
    // division is NOT distributive over duplicate edge rows
    // (⌊a·w₁/W⌋ + ⌊a·w₂/W⌋ ≠ ⌊a·(w₁+w₂)/W⌋), so the edge multiset must
    // be aggregated before the first round for partitioning-invariant,
    // oracle-reproducible results
    val eRaw = edges
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w").cast("long")).as("w"))
    // the edge frame is consumed ~2× per round (contribs join, wtot)
    // plus nodes/dangling — callers whose edge DERIVATION is expensive
    // (q267 tokenizes the corpus: 9× re-tokenization, 6.1→1.6 s) opt in
    // to a one-time checkpoint; for trivial scan+project edge frames
    // the pinned blocks are a pure fixed cost (q164 regressed ~2× in
    // r10 when this was unconditional), so the default recomputes
    val e = if (checkpointEdges) eRaw.localCheckpoint(eager = false) else eRaw
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = true)
    val n = nodes.count() // the one driver-side scalar (node count)
    val out = e.groupBy(col("src")).agg(sum(col("w")).as("wtot"))
    // restart-mass recipient count: all nodes (global PR) or the seeds
    val nRestart = restart.map(_.length.toLong).getOrElse(n)
    val isTarget: Column =
      restart.map(ss => col("node").isin(ss: _*)).getOrElse(lit(true))
    val base = (scale * (dampDen - dampNum) / dampDen) / nRestart

    var ranks = (ranks0, restart) match {
      case (None, None) => nodes.withColumn("rank", lit(scale / n))
      case (None, Some(_)) => nodes.withColumn("rank",
        when(isTarget, lit(scale / nRestart)).otherwise(lit(0L)))
      case (Some(r0), _) => nodes
        .join(r0.select(col("node"), col("rank").as("__r0")), Seq("node"), "left")
        .select(col("node"), coalesce(col("__r0"), lit(scale / n)).as("rank"))
    }
    for (_ <- 1 to iters) {
      // damped mass of nodes with no out-edges, as a 1-row frame
      val dm = ranks.join(out, ranks("node") === out("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(out, Seq("src"))
        .select(col("dst").as("node"),
          expr(s"(((rank * $dampNum) div $dampDen) * w) div wtot").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("csum"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(dm)
        .select(col("node"),
          (when(isTarget, lit(base)).otherwise(lit(0L)) +
            coalesce(col("csum"), lit(0L)) +
            when(isTarget,
              expr(s"((dm * $dampNum) div $dampDen) div $nRestart"))
              .otherwise(lit(0L))).as("rank"))
        .localCheckpoint(eager = true)
    }
    ranks
  }
}
