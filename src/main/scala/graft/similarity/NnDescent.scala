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
    * `buckets = 0` (the default) auto-sizes to max(16, ⌈N∕2k⌉), so the
    * expected bucket holds ~2k nodes AT ANY corpus size — a FIXED
    * bucket count is the q214 scale trap (buckets get deeper, not
    * more numerous, and init pairs grow quadratically: measured 18×
    * wall for 10× vectors at sf1 before auto-sizing). A sparse init
    * only costs recall in round 1; the exchange rounds recover. */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String, k: Int,
               rounds: Int = 2, buckets: Int = 0, bucketTables: Int = 2,
               salt: String = "nnd"): DataFrame = {
    val spark = df.sparkSession
    val sv = df.select(col(idCol).cast("long").as("id"),
        Knn.scaledVec(col(vecCol)).as("sv"))
      .withColumn("n2", Knn.norm2Scaled(col("sv")))
      .localCheckpoint(eager = true) // scored against every round
    val nBuckets =
      if (buckets > 0) buckets
      else math.max(16L, math.ceil(sv.count() / (2.0 * k)).toLong)

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
          col("id"))), 1, 7), 16, 10).cast("long") % nBuckets)
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

  /** Greedy graph-routed search over a built k-NN graph — the serving
    * step the index exists for (the layer-0 walk of HNSW-family
    * engines): every query walks from EACH of the `entries` nodes, a
    * hop moves to the current node's graph neighbor closest to the
    * query, and the query keeps its best endpoint across entries.
    * Multiple spread entries are load-bearing, not a tuning knob: a
    * k-NN graph over clustered data is typically DISCONNECTED (every
    * top-k neighbor is in-cluster), so a single-entry walk can never
    * leave the entry's component — the flaw HNSW's upper layers
    * solve, answered here the flat-graph way (one walk per entry,
    * best-of). `hops` bounds each walk (small-world components route
    * in O(log N)); a walk that converges early carries its result
    * through the remaining joins untouched.
    *
    * Deterministic end to end: integer cosines (ties nid-asc via
    * max_by on a packed (cos_e9, −nid) pair), fixed entry nodes, a
    * fixed hop count, best-of-entries by (best, −cur, −entry) — the
    * oracle unrolls the walks hop by hop on the replayed graph. Per
    * hop: one equi-join state×graph (state is |queries|·|entries|
    * rows, fan-out ≤ k) and one scoring pass — never a scan of the
    * corpus, which is the point: at 100 TB the corpus is only touched
    * through the graph's adjacency.
    *
    * @param graph (qid, nid, ...) adjacency — [[knnGraph]]'s output
    * @return (qid, found, cos_e9, moved) — `found` the best endpoint
    *         over all entry walks, `moved` that walk's improving hops */
  def greedySearch(graph: DataFrame, vecs: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String, entries: Seq[Long],
                   hops: Int): DataFrame = {
    val sv = vecs.select(col(idCol).cast("long").as("id"),
        Knn.scaledVec(col(vecCol)).as("sv"))
      .withColumn("n2", Knn.norm2Scaled(col("sv")))
      .localCheckpoint(eager = true) // rescored every hop
    val adj = graph.select(col("qid").as("cur"), col("nid"))
      .localCheckpoint(eager = true)

    // query-to-candidate integer cosine over (__qv,__qn) × (__nv,__nn)
    val cosTo =
      floor(Knn.dotScaled(col("__qv"), col("__nv")) /
        (sqrt(col("__qn")) * sqrt(col("__nn"))) * lit(1e9) + lit(0.5))
        .cast("long")
    val NoCand = -2000000000L // below any real cosine (>= -1e9)

    val q0 = queries.select(col(idCol).cast("long").as("qid"))
      .join(sv.select(col("id").as("qid"), col("sv").as("__qv"),
        col("n2").as("__qn")), Seq("qid"))
    // |entries| literal rows: one walk per (query, entry). The
    // crossJoin is a bounded LITERAL frame broadcast (a handful of
    // entry ids) — the legitimate scalar-broadcast class, never
    // data x data
    val entryDf = {
      val ss = queries.sparkSession
      import ss.implicits._
      entries.toDF("entry")
    }
    // an entry id absent from `vecs` silently drops ITS walk for every
    // query (inner join below); if none resolve, the whole output
    // vanishes — input contract, fail fast (a handful-of-rows check)
    require(sv.join(entryDf, col("id") === col("entry"), "left_semi")
      .count() == entries.distinct.length,
      s"greedySearch: some entry ids ${entries.mkString("[", ",", "]")} " +
        "are not present in the vector frame")
    var state = q0
      .crossJoin(broadcast(entryDf))
      .join(sv.select(col("id").as("cur"), col("sv").as("__nv"),
        col("n2").as("__nn")), col("cur") === col("entry"))
      .select(col("qid"), col("entry"), col("__qv"), col("__qn"),
        col("cur"), cosTo.as("best"), lit(0).as("moved"))

    (1 to hops).foreach { _ =>
      // candidate neighbors of the current node, scored against the query
      val scored = state.join(adj, Seq("cur"), "left")
        .join(sv.select(col("id").as("nid"), col("sv").as("__nv"),
          col("n2").as("__nn")), Seq("nid"), "left")
        .withColumn("__cand",
          when(col("nid").isNull, lit(NoCand)).otherwise(cosTo))
      // argmax by (cos, nid asc): pack into one orderable struct
      val next = scored.groupBy(col("qid"), col("entry"), col("__qv"),
          col("__qn"), col("cur"), col("best"), col("moved"))
        .agg(max_by(col("nid"),
            struct(col("__cand").as("c"), (-col("nid")).as("t"))).as("bn"),
          max(col("__cand")).as("bc"))
      state = next.select(col("qid"), col("entry"), col("__qv"), col("__qn"),
        when(col("bc") > col("best"), col("bn")).otherwise(col("cur")).as("cur"),
        greatest(col("best"), coalesce(col("bc"), col("best"))).as("best"),
        (col("moved") + when(col("bc") > col("best"), 1).otherwise(0)).as("moved"))
    }
    // best endpoint across entry walks, ties (best desc, cur asc, entry asc)
    state.groupBy(col("qid"))
      .agg(max_by(
          struct(col("cur").as("c"), col("best").as("b"), col("moved").as("m")),
          struct(col("best").as("b"), (-col("cur")).as("c"),
            (-col("entry")).as("e"))).as("w"))
      .select(col("qid"), col("w.c").as("found"), col("w.b").as("cos_e9"),
        col("w.m").cast("long").as("moved"))
  }

  /** Incremental graph maintenance — the landed-index arm of
    * [[knnGraph]] (every other index in the suite has one: LSH bands,
    * shingle grams, chunk fingerprints, and since r10 the suffix
    * array): a batch of NEW vectors joins a landed graph without any
    * rebuild. Each new vector greedy-routes through the landed
    * adjacency ([[greedySearch]], multi-entry) to its home
    * neighborhood, its candidates are the endpoint plus the
    * endpoint's GENERAL (out ∪ in) neighbors — the HNSW insert
    * recipe on a flat graph — and its top-k of the exactly-scored
    * candidates become its edges. Returns the batch DELTA (qid =
    * new id, rank, nid, cos_e9), appendable to the landed edge
    * table; landed nodes' own lists are untouched (reverse-edge
    * refresh is a compaction-time concern, like every landed index
    * here). Cost tracks the BATCH: |new| walks + |new|·O(k)
    * scorings — the landed corpus is only read through the graph. */
  def insertBatch(graph: DataFrame, vecs: DataFrame, newVecs: DataFrame,
                  idCol: String, vecCol: String, k: Int,
                  entries: Seq[Long], hops: Int): DataFrame = {
    val sv = vecs.select(col(idCol).cast("long").as("id"),
        Knn.scaledVec(col(vecCol)).as("sv"))
      .withColumn("n2", Knn.norm2Scaled(col("sv")))
      .localCheckpoint(eager = true) // routed + scored
    val routed = greedySearch(graph, vecs, newVecs, idCol, vecCol,
      entries, hops)
    val gen = graph.select(col("qid").as("u"), col("nid"))
      .unionByName(graph.select(col("nid").as("u"), col("qid").as("nid")))
      .distinct()
    val cand = routed.select(col("qid").as("a"), col("found").as("b"))
      .unionByName(
        routed.select(col("qid").as("a"), col("found").as("u"))
          .join(gen, Seq("u"))
          .select(col("a"), col("nid").as("b")))
      .distinct()
    val scored = cand
      .join(sv.select(col("id").as("a"), col("sv").as("__qv"),
        col("n2").as("__qn")), Seq("a"))
      .join(sv.select(col("id").as("b"), col("sv").as("__nv"),
        col("n2").as("__nn")), Seq("b"))
      .select(col("a").as("qid"), col("b").as("nid"),
        floor(Knn.dotScaled(col("__qv"), col("__nv")) /
          (sqrt(col("__qn")) * sqrt(col("__nn"))) * lit(1e9) + lit(0.5))
          .cast("long").as("cos_e9"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_e9").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos_e9"))
  }
}
