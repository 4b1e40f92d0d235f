package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities over a (src, dst, w) edge list
  * (Kleinberg 1999) — the complementary centrality to [[PageRank]]:
  * authorities are pages good pages point TO (content worth keeping),
  * hubs are pages that point AT good pages (directory/index pages a
  * crawl frontier should expand but a corpus should often drop). Web
  * curation uses the pair to separate link-collection boilerplate from
  * linked-to content; PageRank alone can't distinguish them.
  *
  * Execution shape: each round is TWO join+aggregate shuffles — hubs
  * flow down edges onto dst (the authority update), the normalized
  * authorities flow back up onto src (the hub update) — with each L1
  * normalization a 1-row scalar aggregate cross-joined back (never
  * collected). Score state is a (node, auth, hub) DataFrame;
  * per-round `localCheckpoint` cuts the doubling lineage exactly like
  * [[PageRank]] and [[graft.dedup.Components]].
  *
  * Numerics: scores live in integer units of `scale⁻¹` and every
  * round renormalizes the L1 mass back to `scale` with a truncating
  * division routed through DECIMAL(38,0) — raw sums are exact decimal
  * arithmetic (Spark) / HUGEINT (any int128-bearing oracle engine), so
  * results are bit-reproducible under any partitioning and the DuckDB
  * oracle unrolls the identical rounds (q164). Classic HITS normalizes
  * by the L2 norm; the L1 choice preserves the fixpoint direction
  * (normalization only rescales) while staying in integer arithmetic —
  * the same trade [[PageRank]] makes, documented rather than hidden.
  *
  * Overflow headroom: score ≤ scale = 1e12; a raw sum is ≤
  * scale · W (total weighted degree) ≤ ~1e26 for W ≤ 1e14, and
  * raw·scale ≤ 1e38 at the DECIMAL(38,0) boundary — beyond that pass a
  * smaller `scale`.
  */
object Hits {

  /** Run `iters` rounds; returns (node, auth, hub) in units of
    * 1/scale. Nodes = distinct endpoints; nodes with no in-edges get
    * auth 0, nodes with no out-edges hub 0 (mass renormalizes onto the
    * rest, truncation sheds ≤ n units per round — identically on the
    * oracle side). */
  def run(edges: DataFrame, iters: Int, scale: Long = 1000000000000L,
          checkpointEdges: Boolean = false): DataFrame = {
    require(iters >= 1)
    // one row per (src, dst): truncating normalization is not
    // distributive over duplicate edge rows (same argument as PageRank).
    // Checkpointing the canonical edge frame is caller-opt-in, same
    // rationale as [[PageRank.iterate]]: a win only when the edge
    // derivation is expensive, a fixed pinned-block cost otherwise
    // (q164's trivial link projection regressed ~2× under it in r10)
    val eRaw = edges
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w").cast("long")).as("w"))
    val e = if (checkpointEdges) eRaw.localCheckpoint(eager = false) else eRaw
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = true)
    val n = nodes.count()

    // raw → L1-renormalized score: CAST(raw·scale AS DECIMAL) div total,
    // IntegralDivide → long; a missing raw (no in/out edges) is 0
    def normalized(raw: DataFrame, out: String): DataFrame = {
      val tot = raw.agg(sum(col("__raw")).as("__t"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          coalesce(
            expr(s"(CAST(coalesce(__raw, 0) AS DECIMAL(38,0)) * $scale) div nullif(__t, 0)"),
            lit(0L)).as(out))
    }

    var scores = nodes
      .withColumn("auth", lit(scale / n))
      .withColumn("hub", lit(scale / n))
    for (_ <- 1 to iters) {
      val authRaw = e
        .join(scores.select(col("node").as("src"), col("hub")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("hub").cast("decimal(38,0)") * col("w")).as("__raw"))
      val auth = normalized(authRaw, "auth")
      val hubRaw = e
        .join(auth.select(col("node").as("dst"), col("auth")), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(sum(col("auth").cast("decimal(38,0)") * col("w")).as("__raw"))
      val hub = normalized(hubRaw, "hub")
      scores = auth.join(hub, Seq("node")).localCheckpoint(eager = false)
    }
    scores
  }
}
