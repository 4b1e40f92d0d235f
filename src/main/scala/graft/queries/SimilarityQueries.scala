package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.similarity.Knn

/** Similarity search over the `embeddings` table (array<float>):
  * brute-force cosine top-k (the exact baseline), threshold pair
  * search (embedding near-dup), and hyperplane-LSH ANN (the scale
  * path, recall-tested against the baseline rather than oracle-checked).
  *
  * Cosines are computed on DECIMAL-cast elements so the result is
  * order-independent and engine-reproducible (see graft.similarity.Knn).
  */
object SimilarityQueries {

  /** Shared SQL mirror of the decimal-exact cosine machinery. */
  private val elSql =
    """el AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DECIMAL(18,9)) AS e,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      |n2 AS (SELECT vec_id, CAST(SUM(e * e) AS DOUBLE) AS n2 FROM el GROUP BY vec_id)""".stripMargin

  /** Brute-force cosine top-5 for the first 10 vectors as queries. */
  val q40 = GQuery(
    "q40_knn_bruteforce",
    (s, d) => {
      val emb = embeddings(s, d)
      Knn.bruteForceTopK(
        corpus = emb, queries = emb.filter(col("vec_id") < 10),
        idCol = "vec_id", vecCol = "embedding", k = 5)
        .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 4).as("cos"))
    },
    Some(s"""WITH $elSql,
      |dot AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid, CAST(SUM(q.e * c.e) AS DOUBLE) AS dot
      |  FROM el q JOIN el c ON q.i = c.i AND q.vec_id < 10 AND q.vec_id <> c.vec_id
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.qid, d.nid, d.dot / (sqrt(nq.n2) * sqrt(nc.n2)) AS cos
      |  FROM dot d JOIN n2 nq ON d.qid = nq.vec_id JOIN n2 nc ON d.nid = nc.vec_id),
      |ranked AS (
      |  SELECT qid, nid, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |  FROM scored)
      |SELECT qid, CAST(rank AS INT) AS rank, nid, round(cos, 4) AS cos
      |FROM ranked WHERE rank <= 5""".stripMargin),
    headline = true)

  /** Embedding near-dup pairs: cosine ≥ 0.25 within the first 100
    * vectors (the data's cross-pair cosines top out ≈0.38, so the
    * threshold exercises a non-empty but selective band). */
  val q41 = GQuery(
    "q41_embedding_neardup",
    (s, d) =>
      Knn.cosinePairs(embeddings(s, d).filter(col("vec_id") < 100),
          "vec_id", "embedding", threshold = 0.25)
        .select(col("va"), col("vb"), round(col("cos"), 4).as("cos")),
    Some(s"""WITH $elSql,
      |dot AS (
      |  SELECT a.vec_id AS va, b.vec_id AS vb, CAST(SUM(a.e * b.e) AS DOUBLE) AS dot
      |  FROM el a JOIN el b ON a.i = b.i AND a.vec_id < b.vec_id
      |  WHERE a.vec_id < 100 AND b.vec_id < 100
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.va, d.vb, d.dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cos
      |  FROM dot d JOIN n2 na ON d.va = na.vec_id JOIN n2 nb ON d.vb = nb.vec_id)
      |SELECT va, vb, round(cos, 4) AS cos FROM scored WHERE cos >= 0.25""".stripMargin))

  /** Hyperplane-LSH ANN (4 tables × 6 planes, AND-OR): the 100-TB-scale
    * path where the candidate join is bucket-local. Approximate by
    * construction, so no SQL oracle — the driver records rows>0 and
    * KnnSpec measures recall against q40's exact baseline. */
  val q42 = GQuery(
    "q42_lsh_ann",
    (s, d) => {
      val emb = embeddings(s, d)
      Knn.lshTopK(
        corpus = emb, queries = emb.filter(col("vec_id") < 10),
        idCol = "vec_id", vecCol = "embedding", k = 5,
        numPlanes = 6, numTables = 4)
        .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 4).as("cos"))
    },
    None)

  /** IVF ANN: Voronoi-cell partitioned search (4 lists, 2 probes) — the
    * bucketed-by-cell scale path where probes become partition-pruned
    * scans. Approximate; recall + exact-score parity covered by IvfSpec,
    * driver records rows>0. */
  val q48 = GQuery(
    "q48_ivf_ann",
    (s, d) => {
      val emb = embeddings(s, d)
      graft.similarity.Ivf.topK(
        corpus = emb, queries = emb.filter(col("vec_id") < 10),
        idCol = "vec_id", vecCol = "embedding", k = 5,
        nLists = 4, nProbe = 2, iters = 1)
        .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 4).as("cos"))
    },
    None)

  /** Per-label exact mean embedding ([[Knn.centroids]]): the centroid/
    * profile aggregation behind IVF training and per-class embedding
    * QA. Decimal-routed per-dimension means, rounded at the edge. */
  val q53 = GQuery(
    "q53_embedding_centroids",
    (s, d) =>
      Knn.centroids(embeddings(s, d), "label", "embedding")
        // posexplode is 0-based, generate_subscripts 1-based
        .select(col("grp").as("label"), (col("i") + 1).cast("long").as("i"),
          round(col("mean_e"), 6).as("mean_e")),
    Some("""WITH el AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS i,
      |    CAST(unnest(embedding) AS DECIMAL(18,9)) AS e
      |  FROM embeddings)
      |SELECT label, i,
      |round(CAST(SUM(e) AS DOUBLE) / COUNT(e), 6) AS mean_e
      |FROM el GROUP BY label, i""".stripMargin))

  def queries: Seq[GQuery] = Seq(q40, q41, q42, q48, q53)
}
