package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the second
  * scale path next to [[Knn.lshTopK]]: vectors are partitioned into
  * `nLists` Voronoi cells around centroids, and a query scans only its
  * `nProbe` closest cells instead of the corpus.
  *
  * Everything is relational and deterministic: seed centroids are the
  * `nLists` corpus vectors with the smallest md5(id) (a reproducible
  * pseudo-random sample), refined with Lloyd iterations where the
  * assignment step is a per-row fold over centroid literal arrays
  * (schema-sized, shuffle-free — same trick as the LSH sign matrix) and
  * the update step is one grouped average. Cell membership is a plain
  * column, so at 100 TB the corpus can be written bucketed by cell and
  * probes become partition-pruned scans.
  */
object Ivf {

  /** Centroids as driver-side arrays (nLists × dim). Deterministic:
    * md5-ranked seeds + `iters` Lloyd refinements. */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     nLists: Int, iters: Int = 2): Array[Array[Double]] = {
    IvfExprs.register(corpus.sparkSession)
    val seeds = corpus
      .withColumn("__r", md5(col(idCol).cast("string")))
      .orderBy(col("__r"))
      .limit(nLists)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(seeds.length == nLists,
      s"corpus has only ${seeds.length} rows; nLists=$nLists seed centroids need at least nLists")
    (0 until iters).foldLeft(seeds) { (cents, _) =>
      // one native generator-input expression yields (cell, i, e)
      // triples — the assign-then-posexplode spelling gets the __cell
      // projection collapsed through the Generate and re-runs the full
      // assignment per exploded row, dim× redundant ([[IvfLloydPairs]]).
      // e is the scaled-long element: a plain double avg is partition-
      // order dependent, which would make the trained centroids (and
      // with them cell membership) vary run to run; int64 sums are
      // exact and associative at integer-add cost (see Knn.scaledVec)
      val assigned = corpus
        .select(explode(call_function("ivf_lloyd_pairs", col(vecCol),
          typedlit(cents.flatten.toSeq), lit(nLists))).as("__p"))
        .groupBy(col("__p.cell").as("__cell"), col("__p.i").as("i"))
        .agg((sum(col("__p.e")).cast("double") / lit(Knn.Scale) /
          count(col("__p.e"))).as("m"))
        .collect()
      val next = cents.map(_.clone())
      assigned.foreach { r =>
        next(r.getAs[Int]("__cell"))(r.getAs[Int]("i")) = r.getAs[Double]("m")
      }
      next
    }
  }

  /** All-cells squared L2 distances as one native per-row expression
    * ([[IvfCellDists]]) — the compositional fold spelling runs nLists ×
    * dim interpreted lambda frames per row. */
  private def distsCol(vecCol: String, centroids: Array[Array[Double]]): Column =
    call_function("ivf_cell_dists", col(vecCol),
      typedlit(centroids.flatten.toSeq), lit(centroids.length))

  /** Adds `__cell`: index of the nearest centroid (deterministic
    * lowest-index tie-break), computed without any shuffle. */
  def assignCells(df: DataFrame, vecCol: String,
                  centroids: Array[Array[Double]]): DataFrame = {
    IvfExprs.register(df.sparkSession)
    df.withColumn("__cell", call_function("ivf_cell_assign", col(vecCol),
      typedlit(centroids.flatten.toSeq), lit(centroids.length)))
  }

  /** `nProbe` nearest cells per row (for the query side). */
  def probeCells(df: DataFrame, vecCol: String,
                 centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    IvfExprs.register(df.sparkSession)
    val dists = distsCol(vecCol, centroids)
    val ranked = array_sort(array(centroids.indices.map { i =>
      struct(element_at(dists, i + 1).as("d"), lit(i).as("i"))
    }: _*))
    df.withColumn("__probe",
      explode(slice(transform(ranked, s => s.getField("i")), 1, nProbe)))
  }

  /** IVF top-k: exact cosine within the probed cells only. Same output
    * schema as [[Knn.bruteForceTopK]]. A corpus vector lives in exactly
    * one cell, so the probe equi-join yields each (qid, nid) pair at
    * most once — no dedup needed — and the dot is a per-pair scaled-long
    * fold on the joined rows (no element-row explosion). At 100 TB the
    * corpus is written bucketed by `__cell`, making each probe a
    * partition-pruned scan. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           k: Int, nLists: Int, nProbe: Int, iters: Int = 2): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, nLists, iters)
    topKWithCentroids(corpus, queries, idCol, vecCol, k, cents, nProbe)
  }

  /** Incremental-index arm — the FAISS `add()` shape: centroids are
    * trained ONCE on the landed corpus and FROZEN; a new batch is
    * assigned to existing cells by a map-only expression (no retrain,
    * no landed rescan — [[assignCells]] is shuffle-free), and searches
    * probe the merged postings. This is how an IVF index actually
    * lives at 100 TB: arrivals append to cell buckets; retraining is a
    * scheduled compaction decided by a drift signal (per-cell counts —
    * see [[cellCensus]]), not a per-batch cost. Approximation is the
    * standard one: frozen centroids drift from the merged-data optimum
    * (IvfSpec measures recall vs a retrained index); REPRODUCIBILITY
    * is not approximate — same integer arithmetic, so the oracle
    * replays train-on-landed + frozen assignment exactly. */
  def extendAndSearch(landed: DataFrame, batch: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String, k: Int,
                      nLists: Int, nProbe: Int, iters: Int = 2): DataFrame = {
    val cents = trainCentroids(landed, idCol, vecCol, nLists, iters)
    val merged = landed.select(col(idCol), col(vecCol))
      .unionByName(batch.select(col(idCol), col(vecCol)))
    topKWithCentroids(merged, queries, idCol, vecCol, k, cents, nProbe)
  }

  /** Per-cell occupancy of a corpus under given centroids — the drift
    * signal that schedules IVF retraining (skewed growth in a few
    * cells = the frozen partition no longer fits the data). */
  def cellCensus(df: DataFrame, vecCol: String,
                 centroids: Array[Array[Double]]): DataFrame =
    assignCells(df, vecCol, centroids)
      .groupBy(col("__cell").as("cell")).agg(count(lit(1)).as("n"))

  /** Search with FROZEN centroids (see [[topK]] for the plan shape). */
  def topKWithCentroids(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int, cents: Array[Array[Double]],
                        nProbe: Int): DataFrame = {
    val c = assignCells(corpus, vecCol, cents)
      .select(col(idCol).as("nid"), col("__cell"), Knn.scaledVec(col(vecCol)).as("__cv"))
      .withColumn("nn2", Knn.norm2Scaled(col("__cv")))
    val q = probeCells(queries, vecCol, cents, nProbe)
      .select(col(idCol).as("qid"), col("__probe").as("__cell"),
        Knn.scaledVec(col(vecCol)).as("__qv"))
      .withColumn("qn2", Knn.norm2Scaled(col("__qv")))
    val scored = c.join(broadcast(q), Seq("__cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("dot", Knn.dotScaled(col("__qv"), col("__cv")))
      .withColumn("cos", col("dot") / (sqrt(col("qn2")) * sqrt(col("nn2"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }
}
