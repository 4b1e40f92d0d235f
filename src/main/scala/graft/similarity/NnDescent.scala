package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** NN-descent k-NN-graph construction (Dong et al., WWW'11) — the
  * offline graph-index builder beside the retrieval-time ANN arms
  * (LSH [[Knn.lshTopK]], IVF [[Ivf.topK]], PQ [[Pq]]): graph-based
  * ANN serving (HNSW-style) starts from exactly this artifact, a
  * top-k neighbor list per vector.
  *
  * The principle is "a neighbor of a neighbor is likely a neighbor":
  * start from a cheap graph, then repeatedly introduce each node's
  * neighbors TO EACH OTHER, score the new pairs exactly, and keep
  * every node's best k. Each round is two bounded self-joins — never
  * an all-pairs product — and converges in a handful of rounds
  * (recall curve pinned in NnDescentSpec against [[Knn.bruteForceTopK]]).
  *
  * Determinism (so the DuckDB oracle replays the whole build): the
  * init graph comes from md5-derived buckets, similarities are
  * e9-floored integer cosines on the scaled-long exact path
  * ([[Knn.dotScaled]]), and every top-k is (cos_e9 DESC, nid ASC) —
  * each ROUND unrolls as a CTE block (the q153/q203 fixed-round
  * pattern; q251 runs 2 rounds).
  *
  * Scale shape, per round: the general graph is ≤ 2·k·N directed
  * edges; the candidate join is pivot-local (pairs of a node's ≤ 2k
  * general neighbors → ≤ 2k²·N scored pairs, independent of N²);
  * already-scored pairs are anti-joined away before the expensive
  * exact scoring; the per-node top-k rides the TopKPerKey bounded
  * heap. Per-round eager checkpoints with fresh stats — the
  * BradleyTerry/PageRank iterate discipline. */
object NnDescent {

  /** Build the k-NN graph: (qid, rank, nid, cos_e9) with rank 1..k by
    * descending e9-floored cosine, nid-asc ties.
    *
    * `buckets`/`bucketTables`: the init graph — each node lands in
    * one md5 bucket per table and opens against its bucket peers.
    * Size buckets so a bucket holds ≥ k+1 nodes on average; a sparse
    * init only costs recall in round 1, the exchange rounds recover. */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String, k: Int,
               rounds: Int = 2, buckets: Int = 16, bucketTables: Int = 2,
               salt: String = "nnd"): DataFrame = {
    val spark = df.sparkSession
    val sv = df.select(col(idCol).cast("long").as("id"),
        Knn.scaledVec(col(vecCol)).as("sv"))
      .withColumn("n2", Knn.norm2Scaled(col("sv")))
      .localCheckpoint(eager = true) // scored against every round

    def scorePairs(pairs: DataFrame): DataFrame =
      pairs
        .join(sv.select(col("id").as("a"), col("sv").as("__va"),
          col("n2").as("__na")), Seq("a"))
        .join(sv.select(col("id").as("b"), col("sv").as("__vb"),
          col("n2").as("__nb")), Seq("b"))
        .select(col("a"), col("b"),
          floor(Knn.dotScaled(col("__va"), col("__vb")) /
            (sqrt(col("__na")) * sqrt(col("__nb"))) * lit(1e9) + lit(0.5))
            .cast("long").as("cos_e9"))

    /** Per-node best k of the directed (u, nid, cos_e9) edge union. */
    def topK(edges: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("u"))
        .orderBy(col("cos_e9").desc, col("nid").asc)
      edges.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("u"), col("nid"), col("cos_e9"))
    }

    def bothDirections(scored: DataFrame): DataFrame =
      scored.select(col("a").as("u"), col("b").as("nid"), col("cos_e9"))
        .unionByName(scored.select(col("b").as("u"), col("a").as("nid"),
          col("cos_e9")))

    // init: md5-bucketed peers, `bucketTables` independent assignments
    val b = sv.select(col("id"),
        explode(array((0 until bucketTables).map(lit): _*)).as("t"))
      .withColumn("bucket",
        conv(substring(md5(concat(lit(s"$salt-"), col("t"), lit("-"),
          col("id"))), 1, 7), 16, 10).cast("long") % buckets)
    val cand0 = b.select(col("id").as("a"), col("t"), col("bucket"))
      .join(b.select(col("id").as("b"), col("t"), col("bucket")),
        Seq("t", "bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    var edges = topK(bothDirections(scorePairs(cand0)))
      .localCheckpoint(eager = true)
    edges = spark.createDataFrame(edges.rdd, edges.schema)

    (1 to rounds).foreach { _ =>
      val g = edges.select(col("u"), col("nid"))
        .unionByName(edges.select(col("nid").as("u"), col("u").as("nid")))
        .distinct()
      val cand = g.select(col("u"), col("nid").as("a"))
        .join(g.select(col("u"), col("nid").as("b")), Seq("u"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct()
        // don't re-score survivors: an edge's cosine is deterministic,
        // so any (a,b) already in the graph carries its exact score
        .join(edges.select(
            least(col("u"), col("nid")).as("a"),
            greatest(col("u"), col("nid")).as("b")).distinct(),
          Seq("a", "b"), "left_anti")
      val next = topK(edges.unionByName(bothDirections(scorePairs(cand))))
        .localCheckpoint(eager = true)
      edges = spark.createDataFrame(next.rdd, next.schema)
    }

    val w = Window.partitionBy(col("u"))
      .orderBy(col("cos_e9").desc, col("nid").asc)
    edges.withColumn("rank", row_number().over(w).cast("int"))
      .select(col("u").as("qid"), col("rank"), col("nid"), col("cos_e9"))
  }
}
