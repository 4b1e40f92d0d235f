package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-core decomposition via the iterated-H-index fixpoint (Lü, Zhou,
  * Zhang & Stanley, Nature Comms 2016): initialize every node at its
  * degree, then repeatedly replace each node's value with the H-index
  * of its neighbours' values — the largest h such that at least h
  * neighbours hold value ≥ h. The sequence is monotone non-increasing
  * and converges to the node's CORENESS (the largest k for which the
  * node survives k-core peeling). Coreness is the classic crawl/spam
  * filter signal: low-core pages are the tendrils a link-quality gate
  * prunes, high-core subgraphs are the densely-linked hubs.
  *
  * Why H-index iteration instead of literal peeling: peeling removes
  * one degree-class at a time (inherently sequential in k — O(k_max)
  * dependent passes), while the H-index update is a uniform per-node
  * message round — each round is ONE edge⋈value join + one per-node
  * sorted window + one aggregate, identical for every node, which is
  * the 1000-executor shape. Rounds needed = the graph's "convergence
  * depth" (small for real graphs; KCoreSpec pins convergence on the
  * test graph).
  *
  * Determinism: values are integers; the H-index `MAX(LEAST(rank,
  * value))` over neighbours sorted by value desc is invariant to tie
  * order, so the round-t vector is engine-exact and an oracle unrolls
  * rounds as CTEs (the PageRank/LabelProp discipline). Per-round
  * `localCheckpoint` cuts the doubling lineage.
  */
object KCore {

  /** Coreness after `iters` H-index rounds over an UNDIRECTED simple
    * graph (edges symmetrized + deduplicated here; self-loops and null
    * endpoints dropped). Returns (node, degree, coreness). */
  def coreness(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val clean = edges
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    // symmetrize the CLEANED frame — reversing the raw input would let
    // self-loops/null endpoints leak back in through the mirror side
    val und = clean
      .union(clean.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(eager = true)
    val degree = und.groupBy(col("src").as("node")).agg(count(lit(1)).as("c"))
    var cur = degree
    val w = Window.partitionBy(col("src")).orderBy(col("c").desc)
    for (_ <- 1 to iters) {
      cur = und
        .join(cur.select(col("node").as("dst"), col("c")), Seq("dst"))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("src").as("node"))
        .agg(max(least(col("rn"), col("c"))).as("c"))
        .localCheckpoint(eager = true)
    }
    degree.select(col("node"), col("c").as("degree"))
      .join(cur.select(col("node"), col("c").as("coreness")), Seq("node"))
  }
}
