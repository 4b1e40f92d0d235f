package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation over a (src, dst, w) edge list — the
  * cheap community detector curation pipelines run over the domain
  * link graph to find template farms / mirror clusters (families of
  * mutually-linking hosts whose docs should share a dedup budget),
  * complementing [[graft.dedup.Components]]: components answers "what
  * is transitively connected", label propagation answers "what is
  * densely connected" on a graph that is usually one giant component.
  *
  * Execution shape per round is ONE shuffle: the undirected,
  * weight-aggregated edge list (pinned once with `localCheckpoint` —
  * it is re-read every round) joins the current label vector on `src`,
  * votes aggregate map-side on (dst, label), and a per-dst window
  * picks the winner. Label state is (node, label) with per-round
  * `localCheckpoint` cutting the doubling lineage, exactly like
  * [[PageRank]] / [[graft.dedup.Components.connected]].
  *
  * Determinism (the classic label-prop pitfall) is engineered out:
  * updates are synchronous (no visit order), every node starts with
  * its own id, and the vote argmax breaks ties by (total weight DESC,
  * label ASC) — integer weights, so there is no float ordering
  * hazard and a SQL oracle unrolls the same rounds bit-identically. */
object LabelProp {

  /** `iters` synchronous rounds; returns (node, label). Nodes are the
    * distinct endpoints; a node with no neighbours keeps its label. */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    // undirected canonical edge list: both directions, weights summed
    // per (src, dst) so the vote of a mutual pair counts once per side
    val dir = edges
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
    val und = dir
      .unionByName(dir.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .localCheckpoint(eager = false)

    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(eager = false)
    val byDst = Window.partitionBy(col("dst"))
      .orderBy(col("wsum").desc, col("label").asc)
    var it = 0
    while (it < iters) {
      val winner = und.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"), col("label")).agg(sum(col("w")).as("wsum"))
        .withColumn("__rn", row_number().over(byDst))
        .filter(col("__rn") === 1)
        .select(col("dst").as("node"), col("label").as("__best"))
      labels = labels.join(winner, Seq("node"), "left")
        .select(col("node"), coalesce(col("__best"), col("label")).as("label"))
        .localCheckpoint(eager = false)
      it += 1
    }
    labels
  }
}
