package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair set — the clustering
  * step that turns pairwise matches (n-gram Jaccard, MinHash, SimHash,
  * embedding cosine) into dedup groups with one canonical survivor per
  * component. The reference dedups only on exact keys
  * (`/root/reference/R/preprocess-landings.R:267-271`); transitive
  * near-dup grouping is the training-data extension of that step.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each
  * round is two self-joins + aggregations, fully distributed, and the
  * round count is O(log n) on real graphs. No vertex ever holds its
  * whole component in memory, unlike label-propagation-to-fixpoint
  * variants that ship full neighbour lists.
  *
  * Driver involvement is one convergence check per round (a count of
  * changed edges) — bounded work, no data on the driver.
  */
object Components {

  /** Map each node of the undirected edge set `(src, dst)` to its
    * component's minimum node id. Output: (node, component).
    * Nodes must be a numeric/comparable type; isolated nodes (absent
    * from `edges`) are absent from the output — union them in as
    * singletons if needed. */
  def connected(edges: DataFrame, src: String, dst: String,
                maxRounds: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    // canonical directed edge list u -> v (u != v), deduped
    var e = edges.select(col(src).as("u"), col(dst).as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(eager = true)
    var eCount = e.count()

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // large-star: every neighbour v of u with v > u links to u's
      // current minimum neighbour (or u itself)
      val nbrs = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      val large = nbrs.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(least(col("v"), col("m")).as("nu"), greatest(col("v"), col("m")).as("nv"))
        .filter(col("nu") =!= col("nv"))
        .select(col("nu").as("u"), col("nv").as("v"))
        .distinct()
      // small-star: each node u links its smaller neighbours AND itself
      // to the minimum of those neighbours
      val nbrs2 = large.select(col("u"), col("v"))
        .union(large.select(col("v").as("u"), col("u").as("v")))
        .filter(col("v") < col("u"))
      val mins2 = nbrs2.groupBy(col("u"))
        .agg(min(col("v")).as("m"))
      val small = nbrs2.join(mins2, Seq("u"))
        .select(col("v").as("x"), col("m"))
        .union(mins2.select(col("u").as("x"), col("m")))
        .filter(col("x") =!= col("m")) // x >= m by construction
        .select(col("m").as("u"), col("x").as("v"))
        .distinct()
      val next = small.localCheckpoint(eager = true) // cut the growing lineage
      // converged when the edge multiset is the fixpoint star form;
      // the count short-circuit skips the diff job on shrinking rounds
      val nextCount = next.count()
      converged = nextCount == eCount &&
        next.exceptAll(e).limit(1).count() == 0
      e = next
      eCount = nextCount
      round += 1
    }
    // an unconverged mapping silently over/under-merges clusters — fail
    // loudly instead (alternating stars converge in O(log n) rounds, so
    // hitting the cap means maxRounds is set far too low for the graph)
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxRounds rounds")
    // star edges: v's representative is u; add representatives themselves
    e.select(col("v").as("node"), col("u").as("component"))
      .union(e.select(col("u").as("node"), col("u").as("component")))
      .groupBy(col("node")).agg(min(col("component")).as("component"))
  }

  /** Canonical election over near-dup clusters: every clustered doc
    * gets its component plus an `is_canonical` verdict — the
    * best-`qualityCol` member wins, ties to the smallest id (so the
    * quality column can be ANY totally-ordered score: token count, LM
    * log-prob, a classifier output). Docs absent from `pairs` are
    * untouched by definition — near-dup dedup only adjudicates within
    * clusters; callers union isolated docs back as canonical.
    *
    * Output: (idCol, component, qualityCol, is_canonical). One
    * component-keyed window after the component map — the iterative
    * work all lives in [[connected]]. */
  def electCanonical(docs: DataFrame, idCol: String, qualityCol: String,
                     pairs: DataFrame, srcCol: String, dstCol: String): DataFrame =
    electCanonicalFrom(connected(pairs, srcCol, dstCol), docs, idCol, qualityCol)

  /** [[electCanonical]] over a PRECOMPUTED (node, component) map —
    * the landed-artifact seam (`core/Landed`): the component map is
    * the expensive iterative product, so consumers probe one landing
    * instead of re-running the star rounds per query. */
  def electCanonicalFrom(comp: DataFrame, docs: DataFrame, idCol: String,
                         qualityCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    comp.join(docs.select(col(idCol), col(qualityCol)),
        comp("node") === docs(idCol))
      .withColumn("is_canonical", row_number().over(w) === 1)
      .select(col(idCol), col("component"), col(qualityCol), col("is_canonical"))
  }
}
