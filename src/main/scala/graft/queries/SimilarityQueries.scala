package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.core.Exact.dsum
import graft.similarity.{Bitext, GridDbscan, Knn}

/** Similarity search over the `embeddings` table (array<float>):
  * brute-force cosine top-k (the exact baseline), threshold pair
  * search (embedding near-dup), and hyperplane-LSH ANN (the scale
  * path, recall-tested against the baseline rather than oracle-checked).
  *
  * Cosines are computed on SCALED-LONG elements (floor(x·1e7 + 0.5),
  * int64 products/sums, one final /1e14) so the result is
  * order-independent and engine-reproducible at integer-add speed (see
  * graft.similarity.Knn). The oracle keeps its element-table join shape
  * — integer sums are associative, so the fold shape is free to differ.
  */
object SimilarityQueries {

  private val dbscanLabCtes = """p AS (
      |  SELECT vec_id AS id,
      |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0 + 0.5)
      |      AS BIGINT) AS x,
      |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000.0 + 0.5)
      |      AS BIGINT) AS y
      |  FROM embeddings),
      |c AS (
      |  SELECT id, x, y, (x + 1000000000) // 30000 AS cx,
      |    (y + 1000000000) // 30000 AS cy FROM p),
      |pairs AS (
      |  SELECT a.id AS ida, b.id AS idb
      |  FROM c a JOIN c b
      |    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
      |   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
      |   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      |     <= 900000000),
      |deg AS (SELECT ida, COUNT(*) AS deg FROM pairs GROUP BY ida),
      |core AS (SELECT ida AS id FROM deg WHERE deg >= 10),
      |ce AS (
      |  SELECT p2.ida AS u, p2.idb AS v FROM pairs p2
      |  JOIN core c1 ON p2.ida = c1.id JOIN core c2 ON p2.idb = c2.id
      |  WHERE p2.ida <> p2.idb),
      |reach(n, l) AS (
      |  SELECT id, id FROM core
      |  UNION
      |  SELECT e.v, r.l FROM reach r JOIN ce e ON e.u = r.n),
      |comp AS (SELECT n AS id, MIN(l) AS cluster FROM reach GROUP BY n),
      |border AS (
      |  SELECT pr.ida AS id, MIN(cm.cluster) AS cluster
      |  FROM pairs pr JOIN comp cm ON pr.idb = cm.id
      |  WHERE pr.ida NOT IN (SELECT id FROM core)
      |  GROUP BY pr.ida),
      |lab AS (
      |  SELECT p.id,
      |    CASE WHEN cc.id IS NOT NULL THEN 'core'
      |         WHEN b.id IS NOT NULL THEN 'border'
      |         ELSE 'noise' END AS role,
      |    COALESCE(cc.cluster, b.cluster, -1) AS cluster
      |  FROM p LEFT JOIN comp cc ON p.id = cc.id
      |  LEFT JOIN border b ON p.id = b.id)""".stripMargin


  /** Shared SQL mirror of the scaled-long cosine machinery. */
  private val elSql =
    """el AS MATERIALIZED (
      |  SELECT vec_id,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000000.0 + 0.5) AS BIGINT) AS e,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      |n2 AS MATERIALIZED (SELECT vec_id, CAST(SUM(e * e) AS DOUBLE) / 100000000000000.0 AS n2
      |       FROM el GROUP BY vec_id)""".stripMargin

  /** SQL mirror of [[Knn.hyperplaneBuckets]] (4 tables × 6 planes):
    * the md5-derived sign matrix and a left-to-right `list_reduce`
    * fold — bit-identical to the engine's sequential double fold.
    * `from` lets callers bucket a derived relation (q147's planted
    * corpus) and `name` emits several bucket CTEs in one query. */
  private def bucketSql(where: String, from: String = "embeddings",
                        name: String = "b"): String =
    s"""$name AS (
      |  SELECT v.vec_id, pl.t,
      |    CAST(SUM(CASE WHEN
      |      list_reduce(
      |        list_transform(generate_series(1, len(v.embedding)),
      |          i -> CAST(v.embedding[i] AS DOUBLE) *
      |            (CASE WHEN (strpos('0123456789abcdef',
      |                substr(md5(pl.t || ':' || pl.p || ':' || CAST(i - 1 AS VARCHAR)), 1, 1)) - 1) % 2 = 1
      |              THEN 1.0 ELSE -1.0 END)),
      |        (a, x) -> a + x) > 0
      |      THEN CAST(1 AS BIGINT) << pl.p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM $from v, planes pl $where
      |  GROUP BY v.vec_id, pl.t)""".stripMargin

  /** The (table, plane) grid CTE [[bucketSql]] expects in scope. */
  private val planesSql =
    """planes AS (
      |  SELECT t, p
      |  FROM (SELECT unnest(generate_series(0, 3)) AS t),
      |       (SELECT unnest(generate_series(0, 5)) AS p))""".stripMargin

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
      |  SELECT q.vec_id AS qid, c.vec_id AS nid, CAST(SUM(q.e * c.e) AS DOUBLE) / 100000000000000.0 AS dot
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

  /** Embedding near-dup pairs: cosine ≥ 0.25 among LSH-bucket
    * candidates within the first 100 vectors (the data's cross-pair
    * cosines top out ≈0.38, so the threshold exercises a non-empty but
    * selective band). The pair join is bucket-local (never n²); the
    * oracle replays the identical buckets, candidates and scaled-long
    * cosines — recall loss w.r.t. all-pairs is by construction and
    * measured in KnnSpec against [[Knn.cosinePairsExact]]. */
  val q41 = GQuery(
    "q41_embedding_neardup",
    (s, d) =>
      Knn.cosinePairs(embeddings(s, d).filter(col("vec_id") < 100),
          "vec_id", "embedding", threshold = 0.25, numPlanes = 6, numTables = 4)
        .select(col("va"), col("vb"), round(col("cos"), 4).as("cos")),
    Some(s"""WITH $elSql,
      |$planesSql,
      |${bucketSql("WHERE v.vec_id < 100")},
      |cand AS (
      |  SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
      |  FROM b x JOIN b y ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
      |dot AS (
      |  SELECT ca.va, ca.vb, CAST(SUM(a.e * b2.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM cand ca
      |  JOIN el a ON a.vec_id = ca.va
      |  JOIN el b2 ON b2.vec_id = ca.vb AND a.i = b2.i
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.va, d.vb, d.dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cos
      |  FROM dot d JOIN n2 na ON d.va = na.vec_id JOIN n2 nb ON d.vb = nb.vec_id)
      |SELECT va, vb, round(cos, 4) AS cos FROM scored WHERE cos >= 0.25""".stripMargin))

  /** Hyperplane-LSH ANN (4 tables × 6 planes, AND-OR): the 100-TB-scale
    * path where the candidate join is bucket-local. Approximate w.r.t.
    * exact KNN, but fully deterministic: the md5-derived sign matrix and
    * the engine's sequential double fold are both reproducible, so the
    * oracle re-derives the same buckets with `list_reduce` (also a
    * left-to-right fold — bit-identical projections), the same candidate
    * pairs, and the same scaled-long exact cosines. KnnSpec additionally
    * measures recall against q40's exact baseline. */
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
    Some(s"""WITH $elSql,
      |$planesSql,
      |${bucketSql("")},
      |cand AS (
      |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
      |  FROM b q JOIN b c ON q.t = c.t AND q.bucket = c.bucket
      |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
      |dot AS (
      |  SELECT ca.qid, ca.nid, CAST(SUM(q.e * c.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM cand ca
      |  JOIN el q ON q.vec_id = ca.qid
      |  JOIN el c ON c.vec_id = ca.nid AND q.i = c.i
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.qid, d.nid, d.dot / (sqrt(nq.n2) * sqrt(nc.n2)) AS cos
      |  FROM dot d JOIN n2 nq ON d.qid = nq.vec_id JOIN n2 nc ON d.nid = nc.vec_id),
      |ranked AS (
      |  SELECT qid, nid, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |  FROM scored)
      |SELECT qid, CAST(rank AS INT) AS rank, nid, round(cos, 4) AS cos
      |FROM ranked WHERE rank <= 5""".stripMargin))

  /** Multi-probe LSH ANN (Lu et al., VLDB'07): 2 tables × 6 planes,
    * each query probing its base bucket PLUS the 2 single-bit
    * perturbations whose projections sit nearest the hyperplane
    * boundary. The scale rationale vs q42: extra TABLES re-materialize
    * the corpus index (storage ∝ tables at 100 TB); extra PROBES only
    * add broadcast-side query rows to the same bucket-local equi-join —
    * recall is bought back at query time, not index-build time. Fully
    * deterministic: the oracle re-derives projections with the same
    * IEEE fold, ranks |proj| identically (bit-equal doubles), flips the
    * same bits via xor, and replays candidates + scaled-long cosines
    * bit-for-bit. KnnSpec pins nProbes=0 ≡ lshTopK and recall-vs-probes
    * monotonicity against the q40 exact baseline. */
  val q257 = GQuery(
    "q257_multiprobe_lsh",
    (s, d) => {
      val emb = embeddings(s, d)
      Knn.multiProbeTopK(
        corpus = emb, queries = emb.filter(col("vec_id") < 10),
        idCol = "vec_id", vecCol = "embedding", k = 5,
        numPlanes = 6, numTables = 2, nProbes = 2)
        .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 4).as("cos"))
    },
    Some(s"""WITH $elSql,
      |planes AS (
      |  SELECT t, p
      |  FROM (SELECT unnest(generate_series(0, 1)) AS t),
      |       (SELECT unnest(generate_series(0, 5)) AS p)),
      |${bucketSql("")},
      |proj AS (
      |  SELECT v.vec_id, pl.t, pl.p,
      |    list_reduce(
      |      list_transform(generate_series(1, len(v.embedding)),
      |        i -> CAST(v.embedding[i] AS DOUBLE) *
      |          (CASE WHEN (strpos('0123456789abcdef',
      |              substr(md5(pl.t || ':' || pl.p || ':' || CAST(i - 1 AS VARCHAR)), 1, 1)) - 1) % 2 = 1
      |            THEN 1.0 ELSE -1.0 END)),
      |      (a, x) -> a + x) AS proj
      |  FROM embeddings v, planes pl
      |  WHERE v.vec_id < 10),
      |qb AS (
      |  SELECT vec_id, t,
      |    CAST(SUM(CASE WHEN proj > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM proj GROUP BY 1, 2),
      |pr AS (
      |  SELECT vec_id, t, p,
      |    row_number() OVER (PARTITION BY vec_id, t ORDER BY abs(proj) ASC, p ASC) AS r
      |  FROM proj),
      |probes AS (
      |  SELECT vec_id, t, bucket FROM qb
      |  UNION ALL
      |  SELECT pr.vec_id, pr.t, xor(qb.bucket, CAST(1 AS BIGINT) << pr.p) AS bucket
      |  FROM pr JOIN qb ON pr.vec_id = qb.vec_id AND pr.t = qb.t
      |  WHERE pr.r <= 2),
      |cand AS (
      |  SELECT DISTINCT pq.vec_id AS qid, c.vec_id AS nid
      |  FROM probes pq JOIN b c ON pq.t = c.t AND pq.bucket = c.bucket
      |  WHERE pq.vec_id <> c.vec_id),
      |dot AS (
      |  SELECT ca.qid, ca.nid, CAST(SUM(q.e * c.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM cand ca
      |  JOIN el q ON q.vec_id = ca.qid
      |  JOIN el c ON c.vec_id = ca.nid AND q.i = c.i
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.qid, d.nid, d.dot / (sqrt(nq.n2) * sqrt(nc.n2)) AS cos
      |  FROM dot d JOIN n2 nq ON d.qid = nq.vec_id JOIN n2 nc ON d.nid = nc.vec_id),
      |ranked AS (
      |  SELECT qid, nid, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |  FROM scored)
      |SELECT qid, CAST(rank AS INT) AS rank, nid, round(cos, 4) AS cos
      |FROM ranked WHERE rank <= 5""".stripMargin))

  /** IVF ANN: Voronoi-cell partitioned search (4 lists, 2 probes) — the
    * bucketed-by-cell scale path where probes become partition-pruned
    * scans. Approximate w.r.t. exact KNN but fully deterministic
    * (md5-ranked seeds, scaled-long Lloyd means, sequential distance
    * folds), so the oracle replays the whole training: seed selection,
    * one unrolled Lloyd iteration, cell assignment, 2-probe search and
    * scaled-long exact cosines — bit-for-bit. IvfSpec adds recall/score
    * parity against the exact baseline. */
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
    Some(s"""WITH $elSql,
      |dim AS (SELECT MAX(len(embedding)) AS d FROM embeddings),
      |seeds AS (
      |  SELECT cell, embedding FROM (
      |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cell,
      |           embedding
      |    FROM embeddings) WHERE cell < 4),
      |seedlist AS (
      |  SELECT cell, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c FROM seeds),
      |d0 AS (
      |  SELECT v.vec_id, s.cell,
      |    list_reduce(list_transform(generate_series(1, len(v.embedding)),
      |      i -> (CAST(v.embedding[i] AS DOUBLE) - s.c[i]) * (CAST(v.embedding[i] AS DOUBLE) - s.c[i])),
      |      (a, b) -> a + b) AS d
      |  FROM embeddings v, seedlist s),
      |a0 AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM d0) WHERE rn = 1),
      |m1 AS (
      |  SELECT a0.cell, el.i, CAST(SUM(el.e) AS DOUBLE) / 10000000.0 / COUNT(el.e) AS m
      |  FROM a0 JOIN el ON el.vec_id = a0.vec_id
      |  GROUP BY a0.cell, el.i),
      |c1 AS (
      |  SELECT s.cell, list(COALESCE(m1.m, s.c[ser.i]) ORDER BY ser.i) AS c
      |  FROM seedlist s
      |  CROSS JOIN (SELECT unnest(generate_series(1, (SELECT d FROM dim))) AS i) ser
      |  LEFT JOIN m1 ON m1.cell = s.cell AND m1.i = ser.i
      |  GROUP BY s.cell),
      |d1 AS (
      |  SELECT v.vec_id, s.cell,
      |    list_reduce(list_transform(generate_series(1, len(v.embedding)),
      |      i -> (CAST(v.embedding[i] AS DOUBLE) - s.c[i]) * (CAST(v.embedding[i] AS DOUBLE) - s.c[i])),
      |      (a, b) -> a + b) AS d
      |  FROM embeddings v, c1 s),
      |a1 AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM d1) WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM d1 WHERE vec_id < 10) WHERE rn <= 2),
      |cand AS (
      |  SELECT DISTINCT p.vec_id AS qid, a1.vec_id AS nid
      |  FROM probes p JOIN a1 ON a1.cell = p.cell
      |  WHERE a1.vec_id <> p.vec_id),
      |dot AS (
      |  SELECT ca.qid, ca.nid, CAST(SUM(q.e * c.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM cand ca
      |  JOIN el q ON q.vec_id = ca.qid
      |  JOIN el c ON c.vec_id = ca.nid AND q.i = c.i
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.qid, d.nid, d.dot / (sqrt(nq.n2) * sqrt(nc.n2)) AS cos
      |  FROM dot d JOIN n2 nq ON d.qid = nq.vec_id JOIN n2 nc ON d.nid = nc.vec_id),
      |ranked AS (
      |  SELECT qid, nid, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |  FROM scored)
      |SELECT qid, CAST(rank AS INT) AS rank, nid, round(cos, 4) AS cos
      |FROM ranked WHERE rank <= 5""".stripMargin))

  /** Incremental IVF maintenance ([[graft.similarity.Ivf
    * .extendAndSearch]]) — the FAISS `add()` arm completing the
    * landed-index discipline for the last index family that lacked one
    * (LSH bands, shingle grams, chunk fingerprints, the suffix array
    * and the k-NN graph all have incremental arms): centroids train
    * once on the LANDED corpus (vec_id % 5 != 0, 1 Lloyd iter, 4
    * lists) and freeze; the new batch (vec_id % 5 = 0) is cell-
    * assigned by a map-only expression — no retrain, no landed rescan
    * — and the batch's own arrivals search the merged postings with 2
    * probes. The oracle replays train-on-landed, frozen assignment of
    * ALL vectors, probe ranking and scaled-long cosines bit-for-bit;
    * IvfSpec measures the frozen-centroid recall cost vs a retrained
    * index. */
  val q261 = GQuery(
    "q261_incremental_ivf",
    (s, d) => {
      val emb = embeddings(s, d)
      graft.similarity.Ivf.extendAndSearch(
        landed = emb.filter(col("vec_id") % 5 =!= 0),
        batch = emb.filter(col("vec_id") % 5 === 0),
        queries = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") < 50),
        idCol = "vec_id", vecCol = "embedding", k = 5,
        nLists = 4, nProbe = 2, iters = 1)
        .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 4).as("cos"))
    },
    Some(s"""WITH $elSql,
      |landed AS (SELECT * FROM embeddings WHERE vec_id % 5 != 0),
      |dim AS (SELECT MAX(len(embedding)) AS d FROM embeddings),
      |seeds AS (
      |  SELECT cell, embedding FROM (
      |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cell,
      |           embedding
      |    FROM landed) WHERE cell < 4),
      |seedlist AS (
      |  SELECT cell, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c FROM seeds),
      |d0 AS (
      |  SELECT v.vec_id, s.cell,
      |    list_reduce(list_transform(generate_series(1, len(v.embedding)),
      |      i -> (CAST(v.embedding[i] AS DOUBLE) - s.c[i]) * (CAST(v.embedding[i] AS DOUBLE) - s.c[i])),
      |      (a, b) -> a + b) AS d
      |  FROM landed v, seedlist s),
      |a0 AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM d0) WHERE rn = 1),
      |m1 AS (
      |  SELECT a0.cell, el.i, CAST(SUM(el.e) AS DOUBLE) / 10000000.0 / COUNT(el.e) AS m
      |  FROM a0 JOIN el ON el.vec_id = a0.vec_id
      |  GROUP BY a0.cell, el.i),
      |c1 AS (
      |  SELECT s.cell, list(COALESCE(m1.m, s.c[ser.i]) ORDER BY ser.i) AS c
      |  FROM seedlist s
      |  CROSS JOIN (SELECT unnest(generate_series(1, (SELECT d FROM dim))) AS i) ser
      |  LEFT JOIN m1 ON m1.cell = s.cell AND m1.i = ser.i
      |  GROUP BY s.cell),
      |d1 AS (
      |  SELECT v.vec_id, s.cell,
      |    list_reduce(list_transform(generate_series(1, len(v.embedding)),
      |      i -> (CAST(v.embedding[i] AS DOUBLE) - s.c[i]) * (CAST(v.embedding[i] AS DOUBLE) - s.c[i])),
      |      (a, b) -> a + b) AS d
      |  FROM embeddings v, c1 s),
      |a1 AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM d1) WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM d1 WHERE vec_id % 5 = 0 AND vec_id < 50) WHERE rn <= 2),
      |cand AS (
      |  SELECT DISTINCT p.vec_id AS qid, a1.vec_id AS nid
      |  FROM probes p JOIN a1 ON a1.cell = p.cell
      |  WHERE a1.vec_id <> p.vec_id),
      |dot AS (
      |  SELECT ca.qid, ca.nid, CAST(SUM(q.e * c.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM cand ca
      |  JOIN el q ON q.vec_id = ca.qid
      |  JOIN el c ON c.vec_id = ca.nid AND q.i = c.i
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.qid, d.nid, d.dot / (sqrt(nq.n2) * sqrt(nc.n2)) AS cos
      |  FROM dot d JOIN n2 nq ON d.qid = nq.vec_id JOIN n2 nc ON d.nid = nc.vec_id),
      |ranked AS (
      |  SELECT qid, nid, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |  FROM scored)
      |SELECT qid, CAST(rank AS INT) AS rank, nid, round(cos, 4) AS cos
      |FROM ranked WHERE rank <= 5""".stripMargin))

  /** Per-label exact mean embedding ([[Knn.centroids]]): the centroid/
    * profile aggregation behind IVF training and per-class embedding
    * QA. Scaled-long per-dimension means, rounded at the edge. */
  val q53 = GQuery(
    "q53_embedding_centroids",
    (s, d) =>
      Knn.centroids(embeddings(s, d), "label", "embedding")
        // posexplode is 0-based, generate_subscripts 1-based
        .select(col("grp").as("label"), (col("i") + 1).cast("long").as("i"),
          round(col("mean_e"), 6).as("mean_e")),
    Some("""WITH el AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS i,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000000.0 + 0.5) AS BIGINT) AS e
      |  FROM embeddings)
      |SELECT label, i,
      |round(CAST(SUM(e) AS DOUBLE) / 10000000.0 / COUNT(e), 6) AS mean_e
      |FROM el GROUP BY label, i""".stripMargin))

  /** q102: per-dimension int8 quantization error report
    * ([[graft.similarity.Quantize.int8ErrorReport]]) — the compression
    * audit an int8 ANN index needs. Moments, the symmetric scale, and
    * the reconstruction-error numerators are all exact integer/decimal
    * arithmetic on scaled-long elements; only the final per-dim
    * divisions are floating point, so both engines round the identical
    * doubles. */
  val q102 = GQuery(
    "q102_int8_quant_error",
    (s, d) =>
      graft.similarity.Quantize.int8ErrorReport(embeddings(s, d), "vec_id", "embedding")
        .select(col("dim").cast("long").as("dim"), col("n"),
          round(col("mean"), 6).as("mean"),
          round(col("std"), 6).as("std"),
          round(col("max_abs"), 6).as("max_abs"),
          round(col("mean_abs_err"), 9).as("mean_abs_err"),
          round(col("max_abs_err"), 9).as("max_abs_err")),
    Some(s"""WITH $elSql,
      |stats AS (
      |  SELECT i, COUNT(*) AS n, CAST(SUM(e) AS DOUBLE) AS s1d,
      |    CAST(SUM(e * e) AS DOUBLE) AS s2d, MAX(ABS(e)) AS maxabs
      |  FROM el GROUP BY i),
      |m AS (SELECT *, s1d / n AS sm FROM stats),
      |err AS (
      |  SELECT el.i,
      |    ABS(el.e * 127 - (CASE WHEN s.maxabs = 0 THEN 0
      |      ELSE LEAST(127, GREATEST(-127,
      |        CAST(FLOOR(CAST(el.e * 127 AS DOUBLE) / s.maxabs + 0.5) AS BIGINT))) END)
      |      * s.maxabs) AS absnum
      |  FROM el JOIN m s ON el.i = s.i)
      |SELECT CAST(s.i - 1 AS BIGINT) AS dim, s.n AS n,
      |  round(s.sm / 10000000.0, 6) AS mean,
      |  round(sqrt(GREATEST(0.0, (s.s2d / s.n - s.sm * s.sm) / 100000000000000.0)), 6) AS std,
      |  round(CAST(s.maxabs AS DOUBLE) / 10000000.0, 6) AS max_abs,
      |  round(CAST(SUM(e2.absnum) AS DOUBLE) / COUNT(*) / 1270000000.0, 9) AS mean_abs_err,
      |  round(CAST(MAX(e2.absnum) AS DOUBLE) / 1270000000.0, 9) AS max_abs_err
      |FROM m s JOIN err e2 ON e2.i = s.i
      |GROUP BY s.i, s.n, s.sm, s.s2d, s.maxabs""".stripMargin))

  /** q105: SemDeDup-style semantic dedup keep-set
    * ([[Knn.semanticDedup]]) — drop any vector with a smaller-id
    * neighbour at cosine ≥ 0.25 among the LSH-bucket candidates, keep
    * the rest. Same deterministic bucket/cosine machinery as q41 (the
    * oracle reuses those CTEs verbatim), composed into the keep/drop
    * verdict an embedding-level corpus dedup actually ships: per-id
    * `n_dups` (smaller-id near neighbours) and `kept`. */
  val q105 = GQuery(
    "q105_semantic_dedup",
    (s, d) =>
      Knn.semanticDedup(embeddings(s, d).filter(col("vec_id") < 100),
          "vec_id", "embedding", threshold = 0.25, numPlanes = 6, numTables = 4),
    Some(s"""WITH $elSql,
      |$planesSql,
      |${bucketSql("WHERE v.vec_id < 100")},
      |cand AS (
      |  SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
      |  FROM b x JOIN b y ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
      |dot AS (
      |  SELECT ca.va, ca.vb, CAST(SUM(a.e * b2.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM cand ca
      |  JOIN el a ON a.vec_id = ca.va
      |  JOIN el b2 ON b2.vec_id = ca.vb AND a.i = b2.i
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT d.va, d.vb
      |  FROM dot d JOIN n2 na ON d.va = na.vec_id JOIN n2 nb ON d.vb = nb.vec_id
      |  WHERE d.dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.25),
      |dups AS (SELECT vb AS vec_id, COUNT(*) AS n_dups FROM pairs GROUP BY vb)
      |SELECT v.vec_id, COALESCE(d.n_dups, 0) AS n_dups,
      |  COALESCE(d.n_dups, 0) = 0 AS kept
      |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 100) v
      |LEFT JOIN dups d ON d.vec_id = v.vec_id
      |ORDER BY v.vec_id""".stripMargin))

  /** q114: quantized-scan ANN with exact re-rank
    * ([[graft.similarity.Quantize.adcTopK]]) — int8-code candidate
    * scan (integer-exact DECIMAL scores, corpus-scale codebook), top-30
    * candidates per query, exact scaled-long cosine re-rank to top-5.
    * Same workload as q40 so recall vs the float brute-force baseline
    * is directly comparable; the oracle replays codes, candidate
    * ranking and re-rank. */
  val q114 = GQuery(
    "q114_quantized_ann",
    (s, d) => {
      val emb = embeddings(s, d)
      graft.similarity.Quantize.adcTopK(
        corpus = emb, queries = emb.filter(col("vec_id") < 10),
        idCol = "vec_id", vecCol = "embedding", k = 5, candK = 30)
        .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 4).as("cos"))
    },
    Some(s"""WITH $elSql,
      |ma AS (SELECT i AS dim, MAX(abs(e)) AS maxabs FROM el GROUP BY 1),
      |codes AS (
      |  SELECT el.vec_id, el.i,
      |    CASE WHEN ma.maxabs = 0 THEN 0
      |         ELSE least(127, greatest(-127,
      |           CAST(floor(CAST(el.e * 127 AS DOUBLE) / ma.maxabs + 0.5) AS BIGINT))) END AS q,
      |    ma.maxabs
      |  FROM el JOIN ma ON el.i = ma.dim),
      |approx AS (
      |  SELECT qs.vec_id AS qid, cs.vec_id AS nid,
      |    SUM(qs.q * cs.q * qs.maxabs * qs.maxabs) AS score
      |  FROM codes qs JOIN codes cs ON qs.i = cs.i
      |    AND qs.vec_id < 10 AND qs.vec_id <> cs.vec_id
      |  GROUP BY 1, 2),
      |cand AS (
      |  SELECT qid, nid FROM (
      |    SELECT qid, nid,
      |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS cr
      |    FROM approx) WHERE cr <= 30),
      |dot AS (
      |  SELECT ca.qid, ca.nid, CAST(SUM(a.e * b.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM cand ca
      |  JOIN el a ON a.vec_id = ca.qid
      |  JOIN el b ON b.vec_id = ca.nid AND a.i = b.i
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.qid, d.nid, d.dot / (sqrt(nq.n2) * sqrt(nc.n2)) AS cos
      |  FROM dot d JOIN n2 nq ON d.qid = nq.vec_id JOIN n2 nc ON d.nid = nc.vec_id)
      |SELECT qid, CAST(rank AS INT) AS rank, nid, round(cos, 4) AS cos
      |FROM (SELECT qid, nid, cos,
      |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |      FROM scored)
      |WHERE rank <= 5""".stripMargin))

  /** q117: MMR diversity re-rank ([[graft.similarity.Mmr]]) — top-12
    * brute-force candidates per query, greedy equal-weight MMR to 5.
    * Every comparison is over e9-floored integer cosines, so the
    * oracle can replay the ENTIRE greedy recursion as a recursive CTE
    * (per-candidate sim vectors as rank-indexed lists; each recursion
    * step re-derives the argmax with the same integer tie-break). */
  val q117 = GQuery(
    "q117_mmr_rerank",
    (s, d) => {
      val emb = embeddings(s, d)
      graft.similarity.Mmr.rerank(
        corpus = emb, queries = emb.filter(col("vec_id") < 6),
        idCol = "vec_id", vecCol = "embedding", candK = 12, k = 5)
    },
    Some(s"""WITH RECURSIVE $elSql,
      |dot AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid,
      |    CAST(SUM(q.e * c.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM el q JOIN el c ON q.i = c.i AND q.vec_id < 6 AND q.vec_id <> c.vec_id
      |  GROUP BY 1, 2),
      |relall AS (
      |  SELECT d.qid, d.nid,
      |    CAST(floor(d.dot / (sqrt(nq.n2) * sqrt(nc.n2)) * 1e9 + 0.5) AS BIGINT) AS rel_e9
      |  FROM dot d JOIN n2 nq ON d.qid = nq.vec_id JOIN n2 nc ON d.nid = nc.vec_id),
      |cand AS (
      |  SELECT qid, nid, rel_e9,
      |    row_number() OVER (PARTITION BY qid ORDER BY rel_e9 DESC, nid ASC) AS r
      |  FROM relall QUALIFY r <= 12),
      |pdot AS (
      |  SELECT a.qid, a.r AS ra, b.r AS rb, a.nid AS na, b.nid AS nb,
      |    CAST(SUM(x.e * y.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM cand a JOIN cand b ON a.qid = b.qid
      |  JOIN el x ON x.vec_id = a.nid
      |  JOIN el y ON y.vec_id = b.nid AND x.i = y.i
      |  GROUP BY 1, 2, 3, 4, 5),
      |simvec AS (
      |  SELECT p.qid, p.ra,
      |    list(CAST(floor(p.dot / (sqrt(na2.n2) * sqrt(nb2.n2)) * 1e9 + 0.5) AS BIGINT)
      |         ORDER BY p.rb) AS sv
      |  FROM pdot p JOIN n2 na2 ON p.na = na2.vec_id JOIN n2 nb2 ON p.nb = nb2.vec_id
      |  GROUP BY p.qid, p.ra),
      |pick AS (
      |  SELECT qid, [CAST(1 AS BIGINT)] AS sel, 1 AS k FROM (SELECT DISTINCT qid FROM cand)
      |  UNION ALL
      |  SELECT p.qid, list_append(p.sel, (
      |      SELECT c.r FROM cand c JOIN simvec v ON v.qid = c.qid AND v.ra = c.r
      |      WHERE c.qid = p.qid AND NOT list_contains(p.sel, c.r)
      |      ORDER BY c.rel_e9 - list_max(list_transform(p.sel, s -> v.sv[CAST(s AS INT)])) DESC,
      |        c.nid ASC
      |      LIMIT 1)), p.k + 1
      |  FROM pick p WHERE p.k < 5)
      |SELECT f.qid, CAST(g.pos AS BIGINT) AS pos, c.nid
      |FROM (SELECT qid, sel FROM pick WHERE k = 5) f
      |CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS pos) g
      |JOIN cand c ON c.qid = f.qid AND c.r = f.sel[CAST(g.pos AS INT)]""".stripMargin))

  /** q119: Johnson–Lindenstrauss projection distortion census
    * ([[graft.similarity.Project]]) — 64 → 16 dims via the md5-parity
    * ±1 matrix, all-pairs ratio `‖Sx−Sy‖²/(p‖x−y‖²)` over the first
    * 50 vectors. Projections and both distance numerators are exact
    * integers; the mean routes through the scaled-long sum. */
  val q119 = GQuery(
    "q119_jl_projection",
    (s, d) => {
      graft.similarity.Project.distortionCensus(
          embeddings(s, d).filter(col("vec_id") < 50),
          "vec_id", "embedding", p = 16)
        .select(col("n_pairs"),
          round(col("mean_ratio"), 6).as("mean_ratio"),
          round(col("min_ratio"), 6).as("min_ratio"),
          round(col("max_ratio"), 6).as("max_ratio"))
    },
    Some(s"""WITH el AS (
      |  SELECT vec_id,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000000.0 + 0.5) AS BIGINT) AS e,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM embeddings WHERE vec_id < 50),
      |signs AS (
      |  SELECT j, i,
      |    CASE WHEN (strpos('0123456789abcdef',
      |      substr(md5('jl:' || j || ':' || CAST(i AS VARCHAR)), 1, 1)) - 1) % 2 = 1
      |      THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS s
      |  FROM (SELECT unnest(generate_series(0, 15)) AS j),
      |       (SELECT unnest(generate_series(0, 63)) AS i)),
      |pd AS (
      |  SELECT el.vec_id, sg.j, SUM(el.e * sg.s) AS y
      |  FROM el JOIN signs sg ON sg.i = el.i - 1
      |  GROUP BY 1, 2),
      |od AS (
      |  SELECT a.vec_id AS ia, b.vec_id AS ib,
      |    SUM((a.e - b.e) * (a.e - b.e)) AS d2
      |  FROM el a JOIN el b ON a.i = b.i AND a.vec_id < b.vec_id
      |  GROUP BY 1, 2),
      |pp AS (
      |  SELECT a.vec_id AS ia, b.vec_id AS ib,
      |    SUM((a.y - b.y) * (a.y - b.y)) AS d2
      |  FROM pd a JOIN pd b ON a.j = b.j AND a.vec_id < b.vec_id
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT CAST(pp.d2 AS DOUBLE) / 16.0 / CAST(od.d2 AS DOUBLE) AS r
      |  FROM od JOIN pp ON od.ia = pp.ia AND od.ib = pp.ib
      |  WHERE CAST(od.d2 AS DOUBLE) > 0)
      |SELECT COUNT(*) AS n_pairs,
      |  round(${graft.core.Exact.sqlLsumAt("r", "1e9")} / COUNT(*), 6) AS mean_ratio,
      |  round(MIN(r), 6) AS min_ratio,
      |  round(MAX(r), 6) AS max_ratio
      |FROM r""".stripMargin))

  /** q122: hard-negative mining ([[Knn.hardNegatives]]) — the
    * close-but-not-duplicate ring (cosine in [0.05, 0.30] e9-floored)
    * per query, top-5. Contrastive training's negative sampler as a
    * band-pass retrieval; integer cosines make the ring and its
    * ranking engine-exact. */
  val q122 = GQuery(
    "q122_hard_negatives",
    (s, d) => {
      val emb = embeddings(s, d)
      Knn.hardNegatives(
        corpus = emb, queries = emb.filter(col("vec_id") < 10),
        idCol = "vec_id", vecCol = "embedding",
        loE9 = 50000000L, hiE9 = 300000000L, k = 5)
    },
    Some(s"""WITH $elSql,
      |dot AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid,
      |    CAST(SUM(q.e * c.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM el q JOIN el c ON q.i = c.i AND q.vec_id < 10 AND q.vec_id <> c.vec_id
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.qid, d.nid,
      |    CAST(floor(d.dot / (sqrt(nq.n2) * sqrt(nc.n2)) * 1e9 + 0.5) AS BIGINT) AS cos_e9
      |  FROM dot d JOIN n2 nq ON d.qid = nq.vec_id JOIN n2 nc ON d.nid = nc.vec_id),
      |banded AS (
      |  SELECT qid, nid, cos_e9,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos_e9 DESC, nid ASC) AS rank
      |  FROM scored WHERE cos_e9 BETWEEN 50000000 AND 300000000)
      |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos_e9
      |FROM banded WHERE rank <= 5""".stripMargin))

  /** q131: margin-based mutual-NN bitext mining
    * ([[graft.similarity.Bitext.minePairs]]) — even vec_ids as side X,
    * odd as side Y, brute-force top-4 each direction, mutual-top-1
    * pairs with integer-exact margin ≥ 1.0. The oracle replays both
    * neighbor directions from one symmetric dot table and the same
    * 2·c·kx·ky / (sx·ky + sy·kx) integer margin. */
  val q131 = GQuery(
    "q131_bitext_mutual_nn",
    (s, d) => {
      val emb = embeddings(s, d)
      Bitext.minePairs(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, minMargin = 1.0)
        .select(col("xid"), col("yid"), col("cos_e9"),
          round(col("margin"), 6).as("margin"))
    },
    Some(s"""WITH $elSql,
      |dotxy AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid,
      |    CAST(SUM(q.e * c.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM el q JOIN el c ON q.i = c.i
      |  WHERE q.vec_id % 2 = 0 AND c.vec_id % 2 = 1
      |  GROUP BY 1, 2),
      |cosxy AS (
      |  SELECT d.qid, d.nid, d.dot / (sqrt(nq.n2) * sqrt(nc.n2)) AS cos,
      |    CAST(floor(d.dot / (sqrt(nq.n2) * sqrt(nc.n2)) * 1000000000.0 + 0.5) AS BIGINT) AS cos_e9
      |  FROM dotxy d JOIN n2 nq ON d.qid = nq.vec_id JOIN n2 nc ON d.nid = nc.vec_id),
      |rxy AS (
      |  -- rank on the DOUBLE cosine (the engine floors to e9 after
      |  -- ranking), ties by neighbor id
      |  SELECT qid, nid, cos_e9,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |  FROM cosxy),
      |ryx AS (
      |  SELECT nid AS qid, qid AS nid, cos_e9,
      |    row_number() OVER (PARTITION BY nid ORDER BY cos DESC, qid ASC) AS rank
      |  FROM cosxy),
      |sx AS (SELECT qid AS xid, SUM(cos_e9) AS sx, COUNT(*) AS kx
      |       FROM rxy WHERE rank <= 4 GROUP BY qid),
      |sy AS (SELECT qid AS yid, SUM(cos_e9) AS sy, COUNT(*) AS ky
      |       FROM ryx WHERE rank <= 4 GROUP BY qid),
      |t1xy AS (SELECT qid AS xid, nid AS yid, cos_e9 FROM rxy WHERE rank = 1),
      |t1yx AS (SELECT qid AS yid, nid AS xid FROM ryx WHERE rank = 1),
      |mutual AS (
      |  SELECT t.xid, t.yid, t.cos_e9,
      |    CAST(2 * t.cos_e9 * x.kx * y.ky AS DOUBLE)
      |      / CAST(x.sx * y.ky + y.sy * x.kx AS DOUBLE) AS margin
      |  FROM t1xy t
      |  JOIN t1yx m ON t.xid = m.xid AND t.yid = m.yid
      |  JOIN sx x ON t.xid = x.xid JOIN sy y ON t.yid = y.yid)
      |SELECT xid, yid, cos_e9, round(margin, 6) AS margin
      |FROM mutual WHERE margin >= 1.0""".stripMargin))

  /** q147: embedding-space decontamination
    * ([[Knn.embeddingDecontaminateLsh]]) — the semantic arm of the
    * decontamination family (q90 LSH shingles, q129 exact n-grams):
    * corpus rows whose cosine against a co-bucketed protected
    * benchmark vector reaches 0.9 are dropped. Protected = label 0;
    * the corpus is the other labels plus PLANTED copies of every
    * protected vector (vec_id + 100000, label kept) — a copy projects
    * identically on every hyperplane, so it ALWAYS shares buckets
    * with its source, scores cos_e9 = 1e9, and must drop; the natural
    * corpus (cross-label cosines ≈ 0.38 max) survives. Candidates
    * come from shared LSH buckets (q41/q42's machinery), exact
    * cosines score candidates only — the 100 TB shape; the brute-
    * force arm stays as the spec reference (KnnSpec). Per-label
    * verdict census; the oracle replays buckets, candidates, and
    * scaled-long dots pair-by-pair. */
  val q147 = GQuery(
    "q147_embedding_decontaminate",
    (s, d) => {
      val emb = embeddings(s, d)
      val prot = emb.filter(col("label") === 0)
      val corpus = emb.filter(col("label") =!= 0)
        .unionByName(prot.withColumn("vec_id", col("vec_id") + 100000))
      val v = Knn.embeddingDecontaminateLsh(corpus, prot, "vec_id", "embedding",
        thresholdE9 = 900000000L, numPlanes = 6, numTables = 4)
      corpus.select(col("vec_id").as("id"), col("label")).join(v, Seq("id"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).cast("long").as("n_rows"),
          count(when(!col("kept"), 1)).as("n_dropped"),
          sum(when(!col("kept"), col("id"))).as("drop_id_sum"),
          max(col("max_cos_e9")).as("max_e9"),
          sum(col("max_cos_e9")).as("sum_max_e9"))
    },
    Some(s"""WITH corp AS (
      |  SELECT vec_id, embedding, label FROM embeddings WHERE label <> 0
      |  UNION ALL
      |  SELECT vec_id + 100000 AS vec_id, embedding, label
      |  FROM embeddings WHERE label = 0),
      |$planesSql,
      |${bucketSql("", from = "corp", name = "bc")},
      |${bucketSql("WHERE v.label = 0", name = "bp")},
      |cand AS (
      |  SELECT DISTINCT c.vec_id AS cid, p.vec_id AS pid
      |  FROM bc c JOIN bp p ON c.t = p.t AND c.bucket = p.bucket),
      |elc AS (
      |  SELECT vec_id, label,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000000.0 + 0.5) AS BIGINT) AS e,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM corp),
      |elp AS (
      |  SELECT vec_id,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000000.0 + 0.5) AS BIGINT) AS e,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM embeddings WHERE label = 0),
      |n2c AS (SELECT vec_id, CAST(SUM(e * e) AS DOUBLE) / 100000000000000.0 AS n2
      |        FROM elc GROUP BY vec_id),
      |n2p AS (SELECT vec_id, CAST(SUM(e * e) AS DOUBLE) / 100000000000000.0 AS n2
      |        FROM elp GROUP BY vec_id),
      |dot AS (
      |  SELECT ca.cid, ca.pid,
      |    CAST(SUM(c.e * p.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM cand ca
      |  JOIN elc c ON c.vec_id = ca.cid
      |  JOIN elp p ON p.vec_id = ca.pid AND c.i = p.i
      |  GROUP BY 1, 2),
      |pair AS (
      |  SELECT d.cid,
      |    CAST(floor(d.dot / (sqrt(nc.n2) * sqrt(np.n2)) * 1e9 + 0.5) AS BIGINT) AS cos_e9
      |  FROM dot d JOIN n2c nc ON d.cid = nc.vec_id JOIN n2p np ON d.pid = np.vec_id),
      |verdict AS (
      |  SELECT cid, MAX(cos_e9) AS max_cos_e9,
      |    COUNT(CASE WHEN cos_e9 >= 900000000 THEN 1 END) AS n_hits
      |  FROM pair GROUP BY cid)
      |SELECT c.label, COUNT(*) AS n_rows,
      |  COUNT(CASE WHEN v.n_hits > 0 THEN 1 END) AS n_dropped,
      |  CAST(SUM(CASE WHEN v.n_hits > 0 THEN c.vec_id END) AS BIGINT) AS drop_id_sum,
      |  MAX(v.max_cos_e9) AS max_e9,
      |  CAST(SUM(v.max_cos_e9) AS BIGINT) AS sum_max_e9
      |FROM corp c LEFT JOIN verdict v ON c.vec_id = v.cid
      |GROUP BY c.label""".stripMargin))

  /** q173: the PCA second-moment matrix over the embedding corpus
    * ([[graft.similarity.Pca.secondMoment]]) — the one data-scan of a
    * distributed PCA (anisotropy diagnostics, whitening,
    * all-but-the-top post-processing). The gate pins the full upper
    * triangle: d(d+1)/2 exact int64 sums of scaled-element products,
    * map-combined, shuffle of ≤ one short row per (pair, partition).
    * The dim-bounded eigensolve/projection on top is PcaSpec's
    * province (driver-side power iteration isn't SQL). */
  val q173 = GQuery(
    "q173_pca_moment",
    (s, d) => {
      val emb = embeddings(s, d)
      graft.similarity.Pca.secondMoment(emb, "embedding",
        Knn.inferDim(emb, "embedding"))
    },
    Some("""WITH el AS (
      |  SELECT vec_id,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS e,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM embeddings)
      |SELECT CAST(a.i - 1 AS INT) AS i, CAST(b.i - 1 AS INT) AS j,
      |  CAST(SUM(a.e * b.e) AS BIGINT) AS g
      |FROM el a JOIN el b ON a.vec_id = b.vec_id AND b.i >= a.i
      |GROUP BY 1, 2""".stripMargin))

  /** q176: incremental PCA-moment maintenance
    * ([[graft.similarity.Pca.updateMoment]]) — when a vector batch
    * lands/retires, the landed d×d moment updates algebraically
    * (G + G_added − G_removed; only the delta slices are scanned)
    * instead of rescanning the corpus. Exact int64 sums form a group,
    * so the ORACLE IS THE FULL RECOMPUTE over the new corpus — the
    * gate proves incremental ≡ from-scratch bit-for-bit. Fixture:
    * added = vec_id%13=0 (absent from the landed snapshot), removed =
    * vec_id%11=0 of the rest. */
  val q176 = GQuery(
    "q176_pca_incremental",
    (s, d) => {
      val emb = embeddings(s, d)
      val dim = Knn.inferDim(emb, "embedding")
      val isAdded = col("vec_id") % 13 === 0
      val isRemoved = col("vec_id") % 11 === 0 && col("vec_id") % 13 =!= 0
      val old = emb.filter(!isAdded)
      graft.similarity.Pca.updateMoment(
        graft.similarity.Pca.secondMoment(old, "embedding", dim),
        emb.filter(isAdded), old.filter(isRemoved), "embedding", dim)
    },
    Some("""WITH el AS (
      |  SELECT vec_id,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS e,
      |    generate_subscripts(embedding, 1) AS i
      |  FROM embeddings
      |  WHERE NOT (vec_id % 11 = 0 AND vec_id % 13 <> 0))
      |SELECT CAST(a.i - 1 AS INT) AS i, CAST(b.i - 1 AS INT) AS j,
      |  CAST(SUM(a.e * b.e) AS BIGINT) AS g
      |FROM el a JOIN el b ON a.vec_id = b.vec_id AND b.i >= a.i
      |GROUP BY 1, 2""".stripMargin))

  /** q186: product-quantization ADC search
    * ([[graft.similarity.Pq]]) — the compressed-domain ANN kernel
    * (64 floats → 16 nibble codes at m=16/ksub=16): md5-ranked seeds, one Lloyd
    * round, per-row encoding, per-query m×ksub lookup tables, int64-
    * exact ADC distances. The oracle replays seeding, the Lloyd
    * update (exact sum/count rounded half-up through a 2⁵³-safe
    * double), encoding, LUTs and the top-5 ranking — the entire
    * trained pipeline under the hash gate, the q48 convention taken
    * one stage further. PqSpec adds recall against the exact
    * baseline. */
  val q186 = GQuery(
    "q186_pq_adc",
    (s, d) => {
      val emb = embeddings(s, d)
      graft.similarity.Pq.adcTopK(
        corpus = emb, queries = emb.filter(col("vec_id") < 10),
        idCol = "vec_id", vecCol = "embedding", k = 5,
        dim = Knn.inferDim(emb, "embedding"), m = 16, ksub = 16, iters = 1)
    },
    Some(s"""WITH $elSql,
      |seeds AS (
      |  SELECT cell, vec_id FROM (
      |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cell,
      |           vec_id
      |    FROM embeddings) t WHERE cell < 16),
      |bk0 AS (SELECT s.cell AS c, el.i, el.e AS m
      |        FROM seeds s JOIN el ON el.vec_id = s.vec_id),
      |d0 AS (
      |  SELECT el.vec_id, CAST((el.i - 1) // 4 AS INT) AS j, b.c,
      |    SUM((el.e - b.m) * (el.e - b.m)) AS d
      |  FROM el JOIN bk0 b ON b.i = el.i
      |  GROUP BY 1, 2, 3),
      |a0 AS (
      |  SELECT vec_id, j, c AS code FROM (
      |    SELECT vec_id, j, c,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |    FROM d0) t WHERE rn = 1),
      |m1 AS (
      |  SELECT a.code AS c, el.i,
      |    CAST(floor(CAST(SUM(el.e) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS m
      |  FROM el JOIN a0 a
      |    ON a.vec_id = el.vec_id AND a.j = CAST((el.i - 1) // 4 AS INT)
      |  GROUP BY 1, 2),
      |c1 AS (SELECT b.c, b.i, COALESCE(m1.m, b.m) AS m
      |       FROM bk0 b LEFT JOIN m1 ON m1.c = b.c AND m1.i = b.i),
      |d1 AS (
      |  SELECT el.vec_id, CAST((el.i - 1) // 4 AS INT) AS j, c.c,
      |    SUM((el.e - c.m) * (el.e - c.m)) AS d
      |  FROM el JOIN c1 c ON c.i = el.i
      |  GROUP BY 1, 2, 3),
      |a1 AS (
      |  SELECT vec_id, j, c AS code FROM (
      |    SELECT vec_id, j, c,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |    FROM d1) t WHERE rn = 1),
      |lutd AS (
      |  SELECT qe.vec_id AS qid, CAST((c.i - 1) // 4 AS INT) AS j, c.c AS code,
      |    SUM((qe.e - c.m) * (qe.e - c.m)) AS d
      |  FROM el qe JOIN c1 c ON c.i = qe.i
      |  WHERE qe.vec_id < 10 GROUP BY 1, 2, 3),
      |pair AS (
      |  SELECT l.qid, a.vec_id AS nid, CAST(SUM(l.d) AS BIGINT) AS adc
      |  FROM a1 a JOIN lutd l ON l.j = a.j AND l.code = a.code
      |  WHERE a.vec_id <> l.qid
      |  GROUP BY 1, 2)
      |SELECT qid, CAST(rn AS INT) AS rank, nid, adc FROM (
      |  SELECT qid, nid, adc,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, nid) AS rn
      |  FROM pair) t
      |WHERE rn <= 5""".stripMargin))

  /** q188: IVF×PQ composed search ([[graft.similarity.Pq.ivfAdcTopK]])
    * — the actual 100 TB ANN shape: Voronoi cells prune the corpus
    * (2 of 4 probed), PQ codes compress the survivors, int64 ADC
    * scores them. The oracle is the q48 IVF chain and the q186 PQ
    * chain COMPOSED — cell assignment gates the pair set, codes+LUTs
    * gate the scores — so the interplay of the two trained structures
    * sits under one hash. */
  val q188 = GQuery(
    "q188_ivf_pq_adc",
    (s, d) => {
      val emb = embeddings(s, d)
      graft.similarity.Pq.ivfAdcTopK(
        corpus = emb, queries = emb.filter(col("vec_id") < 10),
        idCol = "vec_id", vecCol = "embedding", k = 5,
        nLists = 4, nProbe = 2,
        dim = Knn.inferDim(emb, "embedding"), m = 16, ksub = 16)
    },
    Some(s"""WITH $elSql,
      |dim AS (SELECT MAX(len(embedding)) AS d FROM embeddings),
      |ivseeds AS (
      |  SELECT cell, embedding FROM (
      |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cell,
      |           embedding
      |    FROM embeddings) t WHERE cell < 4),
      |ivsl AS (
      |  SELECT cell, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c FROM ivseeds),
      |ivd0 AS (
      |  SELECT v.vec_id, s.cell,
      |    list_reduce(list_transform(generate_series(1, len(v.embedding)),
      |      i -> (CAST(v.embedding[i] AS DOUBLE) - s.c[i]) * (CAST(v.embedding[i] AS DOUBLE) - s.c[i])),
      |      (a, b) -> a + b) AS d
      |  FROM embeddings v, ivsl s),
      |iva0 AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM ivd0) t WHERE rn = 1),
      |ivm1 AS (
      |  SELECT a.cell, el.i, CAST(SUM(el.e) AS DOUBLE) / 10000000.0 / COUNT(el.e) AS m
      |  FROM iva0 a JOIN el ON el.vec_id = a.vec_id
      |  GROUP BY a.cell, el.i),
      |ivc1 AS (
      |  SELECT s.cell, list(COALESCE(m.m, s.c[ser.i]) ORDER BY ser.i) AS c
      |  FROM ivsl s
      |  CROSS JOIN (SELECT unnest(generate_series(1, (SELECT d FROM dim))) AS i) ser
      |  LEFT JOIN ivm1 m ON m.cell = s.cell AND m.i = ser.i
      |  GROUP BY s.cell),
      |ivd1 AS (
      |  SELECT v.vec_id, s.cell,
      |    list_reduce(list_transform(generate_series(1, len(v.embedding)),
      |      i -> (CAST(v.embedding[i] AS DOUBLE) - s.c[i]) * (CAST(v.embedding[i] AS DOUBLE) - s.c[i])),
      |      (a, b) -> a + b) AS d
      |  FROM embeddings v, ivc1 s),
      |iva1 AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM ivd1) t WHERE rn = 1),
      |ivprobe AS (
      |  SELECT vec_id AS qid, cell FROM (
      |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM ivd1 WHERE vec_id < 10) t WHERE rn <= 2),
      |pqseeds AS (
      |  SELECT cell, vec_id FROM (
      |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cell,
      |           vec_id
      |    FROM embeddings) t WHERE cell < 16),
      |pqbk0 AS (SELECT s.cell AS c, el.i, el.e AS m
      |          FROM pqseeds s JOIN el ON el.vec_id = s.vec_id),
      |pqd0 AS (
      |  SELECT el.vec_id, CAST((el.i - 1) // 4 AS INT) AS j, b.c,
      |    SUM((el.e - b.m) * (el.e - b.m)) AS d
      |  FROM el JOIN pqbk0 b ON b.i = el.i
      |  GROUP BY 1, 2, 3),
      |pqa0 AS (
      |  SELECT vec_id, j, c AS code FROM (
      |    SELECT vec_id, j, c,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |    FROM pqd0) t WHERE rn = 1),
      |pqm1 AS (
      |  SELECT a.code AS c, el.i,
      |    CAST(floor(CAST(SUM(el.e) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS m
      |  FROM el JOIN pqa0 a
      |    ON a.vec_id = el.vec_id AND a.j = CAST((el.i - 1) // 4 AS INT)
      |  GROUP BY 1, 2),
      |pqc1 AS (SELECT b.c, b.i, COALESCE(pqm1.m, b.m) AS m
      |         FROM pqbk0 b LEFT JOIN pqm1 ON pqm1.c = b.c AND pqm1.i = b.i),
      |pqd1 AS (
      |  SELECT el.vec_id, CAST((el.i - 1) // 4 AS INT) AS j, c.c,
      |    SUM((el.e - c.m) * (el.e - c.m)) AS d
      |  FROM el JOIN pqc1 c ON c.i = el.i
      |  GROUP BY 1, 2, 3),
      |pqa1 AS (
      |  SELECT vec_id, j, c AS code FROM (
      |    SELECT vec_id, j, c,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |    FROM pqd1) t WHERE rn = 1),
      |lutd AS (
      |  SELECT qe.vec_id AS qid, CAST((c.i - 1) // 4 AS INT) AS j, c.c AS code,
      |    SUM((qe.e - c.m) * (qe.e - c.m)) AS d
      |  FROM el qe JOIN pqc1 c ON c.i = qe.i
      |  WHERE qe.vec_id < 10 GROUP BY 1, 2, 3),
      |pair AS (
      |  SELECT l.qid, a.vec_id AS nid, CAST(SUM(l.d) AS BIGINT) AS adc
      |  FROM pqa1 a
      |  JOIN lutd l ON l.j = a.j AND l.code = a.code
      |  JOIN iva1 cv ON cv.vec_id = a.vec_id
      |  JOIN ivprobe p ON p.qid = l.qid AND p.cell = cv.cell
      |  WHERE a.vec_id <> l.qid
      |  GROUP BY 1, 2)
      |SELECT qid, CAST(rn AS INT) AS rank, nid, adc FROM (
      |  SELECT qid, nid, adc,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, nid) AS rn
      |  FROM pair) t
      |WHERE rn <= 5""".stripMargin))

  /** q226: greedy farthest-point k-center coreset
    * ([[graft.similarity.KCenter]], Gonzalez 1985) — k=5 maximally-
    * spread probes selected from the embedding corpus (eval seeding /
    * diverse subset selection), then every vector assigned to its
    * nearest center. All distances are EXACT int64 squared L2 on the
    * scaled-long path (d² = ‖a‖² + ‖c‖² − 2a·c, every term a
    * dot_scaled long), so the greedy argmaxes, the assignment argmins
    * and their tie-breaks replay bit-for-bit: the oracle unrolls all
    * five selection rounds as CTEs and re-derives the same census. */
  val q226 = {
    import graft.similarity.KCenter
    val K = 5
    // one selection round: next center = argmax dmin, then fold its
    // distance into the running min
    def roundSql(j: Int): String = {
      val (p, c, t) = (s"d${j - 1}", s"c$j", s"t$j")
      s"""$c AS (SELECT vec_id AS cid, n2 AS cn2 FROM $p
         |  ORDER BY dmin DESC, vec_id ASC LIMIT 1),
         |$t AS (
         |  SELECT x.vec_id, CAST(SUM(x.e * y.e) AS BIGINT) AS dot
         |  FROM eli x JOIN eli y ON x.i = y.i
         |  WHERE y.vec_id = (SELECT cid FROM $c)
         |  GROUP BY x.vec_id),
         |d$j AS (
         |  SELECT a.vec_id, a.n2,
         |    LEAST(a.dmin, a.n2 + (SELECT cn2 FROM $c) - 2 * t.dot) AS dmin
         |  FROM $p a JOIN $t t ON t.vec_id = a.vec_id)""".stripMargin
    }
    GQuery(
      "q226_kcenter_coreset",
      (s, d) => {
        val emb = embeddings(s, d)
        val cs = KCenter.centers(emb, "vec_id", "embedding", K)
        KCenter.assign(emb, "vec_id", "embedding", cs)
          .groupBy(col("ord"), col("center_id"))
          .agg(count(lit(1)).as("n_assigned"),
            max(col("d2")).as("max_d2"),
            sum(col("d2")).as("sum_d2"))
          .select(col("ord").as("center_ord"), col("center_id"),
            col("n_assigned"), col("max_d2"), col("sum_d2"))
      },
      Some(s"""WITH eli AS (
        |  SELECT vec_id,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000000.0 + 0.5)
        |      AS BIGINT) AS e,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |nni AS (SELECT vec_id, CAST(SUM(e * e) AS BIGINT) AS n2
        |        FROM eli GROUP BY vec_id),
        |c0 AS (SELECT vec_id AS cid, n2 AS cn2 FROM nni
        |       ORDER BY vec_id ASC LIMIT 1),
        |t0 AS (
        |  SELECT x.vec_id, CAST(SUM(x.e * y.e) AS BIGINT) AS dot
        |  FROM eli x JOIN eli y ON x.i = y.i
        |  WHERE y.vec_id = (SELECT cid FROM c0)
        |  GROUP BY x.vec_id),
        |d0 AS (
        |  SELECT a.vec_id, a.n2,
        |    a.n2 + (SELECT cn2 FROM c0) - 2 * t.dot AS dmin
        |  FROM nni a JOIN t0 t ON t.vec_id = a.vec_id),
        |${(1 until K).map(roundSql).mkString(",\n")},
        |cen AS (${(0 until K).map(j =>
             s"SELECT $j AS ord, (SELECT cid FROM c$j) AS center_id, " +
               s"(SELECT cn2 FROM c$j) AS cn2").mkString(" UNION ALL ")}),
        |cd AS (
        |  SELECT x.vec_id, y.vec_id AS center_vid,
        |    CAST(SUM(x.e * y.e) AS BIGINT) AS dot
        |  FROM eli x JOIN eli y ON x.i = y.i
        |  WHERE y.vec_id IN (SELECT center_id FROM cen)
        |  GROUP BY x.vec_id, y.vec_id),
        |asg AS (
        |  SELECT a.vec_id, c.ord, c.center_id,
        |    a.n2 + c.cn2 - 2 * cd.dot AS d2,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY a.n2 + c.cn2 - 2 * cd.dot ASC, c.ord ASC) AS rn
        |  FROM nni a CROSS JOIN cen c
        |  JOIN cd ON cd.vec_id = a.vec_id AND cd.center_vid = c.center_id)
        |SELECT ord AS center_ord, center_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_assigned,
        |  CAST(MAX(d2) AS BIGINT) AS max_d2,
        |  CAST(SUM(d2) AS BIGINT) AS sum_d2
        |FROM asg WHERE rn = 1
        |GROUP BY ord, center_id""".stripMargin))
  }

  /** q248: embedding-space drift (linear-kernel MMD) — the embedding
    * counterpart of q191's token-bucket PSI: between two corpus slices,
    * MMD²_linear = ‖μ_A − μ_B‖², the first-moment shift an embedding
    * distribution can't hide. Per-dimension sums ride the scaled-long
    * exact path (one groupBy over exploded dims — 2·dim short rows per
    * partition after map-side combine), so both means and the final
    * distance are order-independent and replay bit-for-bit. Output:
    * per-dimension top shifts + the global MMD² — the alarm a nightly
    * embedding refresh gates on. */
  val q248 = GQuery(
    "q248_embedding_drift",
    (s, d) => {
      val base = embeddings(s, d).select(
          (col("vec_id") % 2 === 0).cast("int").as("half"),
          posexplode(Knn.scaledVec(col("embedding"))).as(Seq("dim", "e")))
        .groupBy(col("dim"))
        .agg(
          sum(when(col("half") === 1, col("e")).otherwise(lit(0L))).as("sa"),
          sum(when(col("half") === 1, lit(1L)).otherwise(lit(0L))).as("na"),
          sum(when(col("half") === 0, col("e")).otherwise(lit(0L))).as("sb"),
          sum(when(col("half") === 0, lit(1L)).otherwise(lit(0L))).as("nb"))
        .withColumn("du",
          col("sa").cast("double") / col("na").cast("double") / lit(Knn.Scale) -
            col("sb").cast("double") / col("nb").cast("double") / lit(Knn.Scale))
        .withColumn("d2_e12", floor(col("du") * col("du") * 1e12 + 0.5).cast("long"))
        .localCheckpoint(eager = false) // total + top-dim arms
      val total = base.agg(sum(col("d2_e12")).as("mmd2_e12"))
      base.orderBy(col("d2_e12").desc, col("dim").asc).limit(5)
        .crossJoin(broadcast(total))
        .select(col("dim"), col("d2_e12"), col("mmd2_e12"))
    },
    Some(s"""WITH el AS (
      |  SELECT CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS half,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000000.0 + 0.5)
      |      AS BIGINT) AS e,
      |    generate_subscripts(embedding, 1) - 1 AS dim
      |  FROM embeddings),
      |sums AS (
      |  SELECT dim,
      |    CAST(SUM(CASE WHEN half = 1 THEN e ELSE 0 END) AS BIGINT) AS sa,
      |    CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(SUM(CASE WHEN half = 0 THEN e ELSE 0 END) AS BIGINT) AS sb,
      |    CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM el GROUP BY dim),
      |dd AS (
      |  SELECT dim,
      |    CAST(FLOOR((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 10000000.0
      |      - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 10000000.0)
      |      * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 10000000.0
      |      - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 10000000.0)
      |      * 1e12 + 0.5) AS BIGINT) AS d2_e12
      |  FROM sums),
      |tot AS (SELECT CAST(SUM(d2_e12) AS BIGINT) AS mmd2_e12 FROM dd)
      |SELECT d.dim, d.d2_e12, t.mmd2_e12
      |FROM dd d, tot t
      |ORDER BY d.d2_e12 DESC, d.dim ASC LIMIT 5""".stripMargin))

  /** q251: NN-descent k-NN-graph construction
    * ([[graft.similarity.NnDescent]], Dong et al. WWW'11) — the
    * offline graph-index builder beside LSH/IVF/PQ retrieval: 2
    * neighbor-exchange rounds from an md5-bucketed init, every pair
    * scored on the scaled-long exact cosine path and every top-k
    * ordered (cos_e9 DESC, nid ASC), so the ENTIRE iterative build —
    * init buckets, per-round candidate generation, anti-joined
    * rescoring, rank selection — unrolls in the oracle as fixed-round
    * CTE blocks (the q153/q203 pattern) and every edge of the final
    * graph sits under the hash. Recall vs the exact baseline is
    * pinned in NnDescentSpec. */
  private val NndK = 6

  /** SQL block scoring candidate (a, b) pairs to integer cosines —
    * the scaled-long exact path the Spark side runs natively. */
  private def nndScoreSql(cand: String, out: String): String =
    s"""d_$out AS MATERIALIZED (
       |  SELECT c.a, c.b, CAST(SUM(ea.e * eb.e) AS DOUBLE)
       |    / 100000000000000.0 AS dot
       |  FROM $cand c
       |  JOIN el ea ON ea.vec_id = c.a
       |  JOIN el eb ON eb.vec_id = c.b AND ea.i = eb.i
       |  GROUP BY c.a, c.b),
       |$out AS MATERIALIZED (
       |  SELECT d.a, d.b,
       |    CAST(floor(d.dot / (sqrt(na.n2) * sqrt(nb.n2)) * 1000000000.0
       |      + 0.5) AS BIGINT) AS cos_e9
       |  FROM d_$out d
       |  JOIN n2 na ON na.vec_id = d.a
       |  JOIN n2 nb ON nb.vec_id = d.b)""".stripMargin

  private def nndTopkSql(edges: String, out: String): String =
    s"""$out AS MATERIALIZED (
       |  SELECT u, nid, cos_e9 FROM (
       |    SELECT u, nid, cos_e9,
       |      row_number() OVER (PARTITION BY u
       |        ORDER BY cos_e9 DESC, nid ASC) AS rk
       |    FROM ($edges) t0) t1
       |  WHERE rk <= $NndK)""".stripMargin

  private def nndRoundSql(prev: String, r: Int): String =
    s"""g$r AS MATERIALIZED (SELECT DISTINCT u, nid FROM (
       |  SELECT u, nid FROM $prev UNION ALL SELECT nid, u FROM $prev) t),
       |c$r AS MATERIALIZED (
       |  SELECT DISTINCT x.nid AS a, y.nid AS b
       |  FROM g$r x JOIN g$r y ON x.u = y.u AND x.nid < y.nid
       |  WHERE NOT EXISTS (SELECT 1 FROM $prev e
       |    WHERE LEAST(e.u, e.nid) = x.nid
       |      AND GREATEST(e.u, e.nid) = y.nid)),
       |${nndScoreSql(s"c$r", s"s$r")},
       |${nndTopkSql(
      s"SELECT u, nid, cos_e9 FROM $prev " +
        s"UNION ALL SELECT a, b, cos_e9 FROM s$r " +
        s"UNION ALL SELECT b, a, cos_e9 FROM s$r", s"e$r")}""".stripMargin

  /** The full graph-build CTE chain ending in `e2` (the 2-round
    * NN-descent graph) — shared by the q251 build oracle, q253's
    * search oracle, and q255's incremental-insert oracle (the latter
    * restricts the indexed corpus via `where`); each replays the
    * build before using the graph. */
  private def nndGraphSqlW(where: String): String =
    s"""$elSql,
       |nbk AS MATERIALIZED (
       |  SELECT GREATEST(16, CAST(CEIL(COUNT(*) / ${2.0 * NndK}) AS BIGINT))
       |    AS nb
       |  FROM embeddings $where),
       |b AS MATERIALIZED (
       |  SELECT vec_id AS id, t,
       |    CAST(('0x' || substr(md5('nnd-' || t || '-' || vec_id), 1, 7))
       |      AS BIGINT) % nbk.nb AS bucket
       |  FROM embeddings, (SELECT unnest(generate_series(0, 1)) AS t), nbk
       |  $where),
       |c0 AS MATERIALIZED (SELECT DISTINCT x.id AS a, y.id AS b
       |       FROM b x JOIN b y
       |       ON x.t = y.t AND x.bucket = y.bucket AND x.id < y.id),
       |${nndScoreSql("c0", "s0")},
       |${nndTopkSql("SELECT a AS u, b AS nid, cos_e9 FROM s0 " +
        "UNION ALL SELECT b, a, cos_e9 FROM s0", "e0")},
       |${nndRoundSql("e0", 1)},
       |${nndRoundSql("e1", 2)}""".stripMargin

  private val nndGraphSql: String = nndGraphSqlW("")

  private def nndBuild(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.similarity.NnDescent.knnGraph(
      embeddings(s, d), "vec_id", "embedding",
      k = NndK, rounds = 2, bucketTables = 2) // buckets auto: max(16,⌈N/2k⌉)

  val q251 = GQuery(
    "q251_nn_descent",
    (s, d) =>
      graft.core.Landed.land(s, s"nnd-graph:$d")(nndBuild(s, d)),
    Some(s"""WITH $nndGraphSql
      |SELECT u AS qid,
      |  CAST(row_number() OVER (PARTITION BY u
      |    ORDER BY cos_e9 DESC, nid ASC) AS INT) AS rank,
      |  nid, cos_e9
      |FROM e2""".stripMargin))

  /** q253: graph-routed ANN search over the LANDED q251 graph
    * ([[graft.similarity.NnDescent.greedySearch]]) — the serving walk
    * the index exists for (the HNSW layer-0 shape) and the
    * load-bearing probe that completes the producer/consumer pair
    * (the q231→q232 landed-artifact discipline): q251 lands the
    * adjacency, q253 greedy-routes 25 queries through it from SIX
    * spread entry nodes (a flat k-NN graph over clustered vectors is
    * typically disconnected, so best-of-entries replaces HNSW's upper
    * layers), touching the corpus only via graph edges. 4 unrolled
    * hops per walk, integer cosines, nid-asc tie-breaks,
    * best-of-entries by (best, cur asc, entry asc); the oracle
    * replays the graph build AND every walk hop by hop, so the
    * routing decision at every hop sits under the hash. */
  /** One greedy hop over the replayed `e2` adjacency for every
    * (query, entry) walk — shared by q253 (search) and q255 (insert
    * routing). */
  private def nndHopSql(prev: String, r: Int): String =
    s"""bst$r AS MATERIALIZED (
       |  SELECT t.qid, t.entry, t.cur, t.nid, t.c FROM (
       |    SELECT s2.qid, s2.entry, s2.cur, g.nid, cq.cos_e9 AS c,
       |      row_number() OVER (PARTITION BY s2.qid, s2.entry
       |        ORDER BY cq.cos_e9 DESC, g.nid ASC) AS rk
       |    FROM $prev s2
       |    JOIN e2 g ON g.u = s2.cur
       |    JOIN cosq cq ON cq.a = s2.qid AND cq.b = g.nid) t
       |  WHERE t.rk = 1),
       |st$r AS MATERIALIZED (
       |  SELECT s.qid, s.entry,
       |    CASE WHEN c.c > s.best THEN c.nid ELSE s.cur END AS cur,
       |    CASE WHEN c.c > s.best THEN c.c ELSE s.best END AS best,
       |    s.moved + CASE WHEN c.c > s.best THEN 1 ELSE 0 END AS moved
       |  FROM $prev s
       |  LEFT JOIN bst$r c ON c.qid = s.qid AND c.entry = s.entry)"""
      .stripMargin

  val q253 = {
    val Hops = 4
    val Entries = Seq(0L, 1L, 2L, 3L, 4L, 5L)
    val hopSql = nndHopSql _
    GQuery(
      "q253_graph_ann_search",
      (s, d) => {
        val emb = embeddings(s, d)
        val graph = graft.core.Landed.probeOrBuild(s, s"nnd-graph:$d")(
          nndBuild(s, d))
        graft.similarity.NnDescent.greedySearch(
          graph, emb, emb.filter(col("vec_id") < 25),
          "vec_id", "embedding", entries = Entries, hops = Hops)
      },
      Some(s"""WITH $nndGraphSql,
        |cq0 AS MATERIALIZED (
        |  SELECT q.vec_id AS a, n.vec_id AS b
        |  FROM embeddings q, embeddings n WHERE q.vec_id < 25),
        |${nndScoreSql("cq0", "cosq")},
        |st0 AS MATERIALIZED (
        |  SELECT a AS qid, b AS entry, b AS cur, cos_e9 AS best,
        |    0 AS moved
        |  FROM cosq WHERE b IN (${Entries.mkString(", ")})),
        |${(1 to Hops).map(r => hopSql(s"st${r - 1}", r)).mkString(",\n")}
        |SELECT qid, cur AS found, best AS cos_e9,
        |  CAST(moved AS BIGINT) AS moved
        |FROM (
        |  SELECT qid, cur, best, moved,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY best DESC, cur ASC, entry ASC) AS rk
        |  FROM st$Hops) t
        |WHERE rk = 1""".stripMargin))
  }

  /** q255: incremental k-NN-graph maintenance
    * ([[graft.similarity.NnDescent.insertBatch]]) — the landed-index
    * arm of the NN-descent graph, closing the last
    * every-index-has-an-incremental-arm gap: a landed graph over 4/5
    * of the vectors absorbs the remaining 1/5 as a batch, each new
    * vector greedy-routed through the landed adjacency (3 hops, 6
    * spread entries) and linked to its top-k among the endpoint's
    * general neighborhood — the HNSW insert recipe, cost tracking
    * the BATCH, landed vectors touched only through graph edges.
    * The oracle replays the landed build, every routing hop, the
    * neighborhood expansion, and the final per-vector ranking. */
  val q255 = {
    val Hops = 3
    val Entries = Seq(1L, 2L, 3L, 4L, 6L, 7L) // landed ids (% 5 != 0)
    GQuery(
      "q255_incremental_knn_graph",
      (s, d) => {
        val emb = embeddings(s, d)
        val landed = emb.filter(col("vec_id") % 5 =!= 0)
        val batch = emb.filter(col("vec_id") % 5 === 0)
        val graph = graft.similarity.NnDescent.knnGraph(
          landed, "vec_id", "embedding", k = NndK, rounds = 2,
          bucketTables = 2)
        graft.similarity.NnDescent.insertBatch(
          graph, emb, batch, "vec_id", "embedding", k = NndK,
          entries = Entries, hops = Hops)
      },
      Some(s"""WITH ${nndGraphSqlW("WHERE vec_id % 5 != 0")},
        |cq0 AS MATERIALIZED (
        |  SELECT q.vec_id AS a, n.vec_id AS b
        |  FROM embeddings q, embeddings n
        |  WHERE q.vec_id % 5 = 0 AND n.vec_id % 5 != 0),
        |${nndScoreSql("cq0", "cosq")},
        |st0 AS MATERIALIZED (
        |  SELECT a AS qid, b AS entry, b AS cur, cos_e9 AS best,
        |    0 AS moved
        |  FROM cosq WHERE b IN (${Entries.mkString(", ")})),
        |${(1 to Hops).map(r => nndHopSql(s"st${r - 1}", r)).mkString(",\n")},
        |endf AS MATERIALIZED (
        |  SELECT qid, cur AS found FROM (
        |    SELECT qid, cur,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY best DESC, cur ASC, entry ASC) AS rk
        |    FROM st$Hops) t
        |  WHERE rk = 1),
        |gen AS MATERIALIZED (
        |  SELECT u, nid FROM e2 UNION SELECT nid, u FROM e2),
        |candp AS MATERIALIZED (
        |  SELECT qid AS a, found AS b FROM endf
        |  UNION
        |  SELECT e.qid, g.nid FROM endf e JOIN gen g ON g.u = e.found)
        |SELECT qid, CAST(rank AS INT) AS rank, nid, cos_e9 FROM (
        |  SELECT c.a AS qid, c.b AS nid, q.cos_e9,
        |    row_number() OVER (PARTITION BY c.a
        |      ORDER BY q.cos_e9 DESC, c.b ASC) AS rank
        |  FROM candp c JOIN cosq q ON q.a = c.a AND q.b = c.b) t
        |WHERE rank <= $NndK""".stripMargin))
  }

  /** q269: Matryoshka truncation-recall eval (Kusupati 2022) — can the
    * first m dims of the 64-dim embedding stand in for the full vector
    * at retrieval time? For m ∈ {8, 16, 32}: brute-force cosine top-10
    * on the truncated prefix vs top-10 on the full vector, recall@10 =
    * |overlap| / (10·n_queries). The eval behind serving truncated
    * vectors from an MRL-trained model (fraction of the index bytes,
    * known recall bill). Same scaled-long cosine machinery as q40, so
    * selection and order are engine-exact at every m; the full top-10
    * lands once (lazy checkpoint) and all three truncations probe it. */
  val q269 = GQuery(
    "q269_matryoshka_recall",
    (s, d) => {
      val emb = embeddings(s, d)
      val qs = emb.filter(col("vec_id") % 97 === 0)
      def topk(m: Int) = {
        def trunc(df: org.apache.spark.sql.DataFrame) =
          if (m == 64) df
          else df.select(col("vec_id"), slice(col("embedding"), 1, m).as("embedding"))
        Knn.bruteForceTopK(trunc(emb), trunc(qs), "vec_id", "embedding", 10)
          .select(col("qid"), col("nid"))
      }
      val full = topk(64).localCheckpoint(eager = false)
      val nq = full.agg(countDistinct(col("qid")).as("n_queries"))
      Seq(8, 16, 32).map { m =>
        topk(m).join(full, Seq("qid", "nid"))
          .agg(count(lit(1)).cast("long").as("hits"))
          .select(lit(m).as("m"), col("hits"))
      }.reduce(_ unionAll _)
        .crossJoin(nq) // 1-row scalar broadcast (the legitimate pattern)
        .select(col("m"), col("n_queries"), col("hits"),
          round(col("hits").cast("double") /
            (lit(10.0) * col("n_queries")), 6).as("recall"))
    },
    Some(s"""WITH ms AS (SELECT unnest([8, 16, 32, 64]) AS m),
      |$elSql,
      |n2m AS (
      |  SELECT ms.m, el.vec_id,
      |    CAST(SUM(el.e * el.e) AS DOUBLE) / 100000000000000.0 AS n2
      |  FROM el, ms WHERE el.i <= ms.m GROUP BY 1, 2),
      |dot AS (
      |  SELECT ms.m, q.vec_id AS qid, c.vec_id AS nid,
      |    CAST(SUM(q.e * c.e) AS DOUBLE) / 100000000000000.0 AS dot
      |  FROM ms, el q JOIN el c ON q.i = c.i
      |  WHERE q.vec_id % 97 = 0 AND q.vec_id <> c.vec_id AND q.i <= ms.m
      |    AND c.i <= ms.m
      |  GROUP BY 1, 2, 3),
      |scored AS (
      |  SELECT d.m, d.qid, d.nid, d.dot / (sqrt(nq.n2) * sqrt(nc.n2)) AS cos
      |  FROM dot d
      |  JOIN n2m nq ON nq.m = d.m AND nq.vec_id = d.qid
      |  JOIN n2m nc ON nc.m = d.m AND nc.vec_id = d.nid),
      |rk AS (
      |  SELECT m, qid, nid,
      |    row_number() OVER (PARTITION BY m, qid ORDER BY cos DESC, nid) AS r
      |  FROM scored),
      |top AS (SELECT m, qid, nid FROM rk WHERE r <= 10),
      |fullq AS (SELECT qid, nid FROM top WHERE m = 64),
      |hits AS (
      |  -- LEFT JOIN from the m list so a zero-overlap truncation still
      |  -- emits its row (Spark's empty-relation count does)
      |  SELECT ms.m, COUNT(mt.qid) AS hits FROM ms
      |  LEFT JOIN (
      |    SELECT t.m, t.qid FROM top t
      |    JOIN fullq f ON t.qid = f.qid AND t.nid = f.nid) mt ON mt.m = ms.m
      |  WHERE ms.m < 64 GROUP BY 1),
      |nq AS (SELECT COUNT(DISTINCT qid) AS n_queries FROM fullq)
      |SELECT h.m, nq.n_queries, CAST(h.hits AS BIGINT) AS hits,
      |  round(CAST(h.hits AS DOUBLE) / (10.0 * nq.n_queries), 6) AS recall
      |FROM hits h, nq""".stripMargin))

  /** q313: embedding isotropy census per label — mean squared norm,
    * average PAIRWISE dot product, and their ratio (Mu & Viswanath
    * 2018's anisotropy diagnostic: a healthy embedding space has
    * near-zero mean pairwise similarity; a collapsed one clusters
    * around a dominant direction and ANN recall quietly dies). The
    * n² pair sum NEVER materializes: Σ_{a≠b}⟨vₐ,v_b⟩ =
    * ‖Σvₐ‖² − Σ‖vₐ‖², so the whole census is per-dimension sum
    * vectors and one norm accumulator off a single exploded scan —
    * exact DECIMAL arithmetic on scaled-long (e7) elements at any
    * vector count, with the two final divisions IEEE, rounded 6. */
  val q313 = GQuery(
    "q313_isotropy_census",
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val el = embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("label"), col("i"),
          floor(col("x").cast("double") * 1e7 + lit(0.5)).cast("long")
            .cast(dec).as("e"))
      val perDim = el.groupBy(col("label"), col("i"))
        .agg(sum(col("e")).as("s_i"), sum(col("e") * col("e")).as("q_i"),
          count(lit(1)).cast("long").as("n_i"))
      perDim.groupBy(col("label"))
        .agg(max(col("n_i")).as("n_vecs"),
          sum(col("s_i") * col("s_i")).as("ss"),
          sum(col("q_i")).as("qq"))
        .select(col("label"), col("n_vecs"),
          expr("round(CAST(qq AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1e14, 6)")
            .as("mean_sq_norm"),
          expr("""CASE WHEN n_vecs > 1 THEN
            |round(CAST(ss - qq AS DOUBLE)
            |  / CAST(CAST(n_vecs AS DECIMAL(38,0)) * (n_vecs - 1) AS DOUBLE)
            |  / 1e14, 6) END""".stripMargin).as("avg_pair_dot"),
          expr("""CASE WHEN n_vecs > 1 AND qq > 0 THEN
            |round(CAST(ss - qq AS DOUBLE)
            |  / CAST(CAST(n_vecs AS DECIMAL(38,0)) * (n_vecs - 1) AS DOUBLE)
            |  / (CAST(qq AS DOUBLE) / CAST(n_vecs AS DOUBLE)), 6)
            |END""".stripMargin).as("anisotropy"))
        .orderBy(col("label"))
    },
    Some("""WITH el AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS i,
      |    CAST(CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000000.0 + 0.5)
      |      AS BIGINT) AS HUGEINT) AS e
      |  FROM embeddings),
      |per_dim AS (
      |  SELECT label, i, SUM(e) AS s_i, SUM(e * e) AS q_i,
      |    CAST(COUNT(*) AS BIGINT) AS n_i
      |  FROM el GROUP BY label, i),
      |agg AS (
      |  SELECT label, CAST(MAX(n_i) AS BIGINT) AS n_vecs,
      |    SUM(s_i * s_i) AS ss, SUM(q_i) AS qq
      |  FROM per_dim GROUP BY label)
      |SELECT label, n_vecs,
      |  round(CAST(qq AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1e14, 6)
      |    AS mean_sq_norm,
      |  CASE WHEN n_vecs > 1 THEN
      |  round(CAST(ss - qq AS DOUBLE)
      |    / CAST(CAST(n_vecs AS HUGEINT) * (n_vecs - 1) AS DOUBLE)
      |    / 1e14, 6) END AS avg_pair_dot,
      |  CASE WHEN n_vecs > 1 AND qq > 0 THEN
      |  round(CAST(ss - qq AS DOUBLE)
      |    / CAST(CAST(n_vecs AS HUGEINT) * (n_vecs - 1) AS DOUBLE)
      |    / (CAST(qq AS DOUBLE) / CAST(n_vecs AS DOUBLE)), 6)
      |  END AS anisotropy
      |FROM agg ORDER BY label""".stripMargin))

  /** q328: grid-DBSCAN density clustering
    * ([[graft.similarity.GridDbscan.cluster]]) over the 2-D embedding
    * projection (dims 1–2, e6-scaled) — the density complement of the
    * q53 centroid family: topical islands become clusters, sparse
    * in-between points stay NOISE instead of being force-assigned.
    * ε = 0.03, minPts = 10 (self included). Census per (cluster,
    * role) with noise under cluster −1; cluster ids are the
    * component-minimum core id so the output is engine-independent.
    * The oracle replays the grid join, the integer ε-test, the
    * core/border rules, and the components via recursive closure.
    * Scale shape: candidate pairs come from a 9-cell equi-join (the
    * 3×3 neighborhood exploded on ONE side), core-core linking is
    * large-star/small-star — no all-pairs product anywhere. */
  val q328 = GQuery(
    "q328_grid_dbscan",
    (s, d) => {
      val lab = dbscanLabels(s, d, probe = false)
      lab.groupBy(coalesce(col("cluster"), lit(-1L)).as("cluster"), col("role"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy(col("cluster"), col("role"))
    },
    Some(s"""WITH RECURSIVE $dbscanLabCtes
      |SELECT cluster, role, CAST(COUNT(*) AS BIGINT) AS n
      |FROM lab GROUP BY cluster, role ORDER BY cluster, role""".stripMargin))

  /** q338: INCREMENTAL grid-DBSCAN ([[GridDbscan.extend]]) — the
    * index-maintenance arm of q328, completing the pattern every
    * index family here carries (SA q252, IVF q261, k-NN graph q255,
    * dHash q199): the 90% base corpus lands a clustering INDEX
    * (degrees, core–core edges, border adjacency), the 10% delta
    * batch extends it by recomputing ONLY the delta's grid cells
    * dilated ±2 (pair candidates from ±3 — degrees change within ±1
    * of a new point, border adjacency within ±2 via promoted
    * neighbors), and only the cheap edge-level component labeling
    * reruns globally (cluster merges cascade arbitrarily far; pair
    * work never does). The oracle REBUILDS from the full union —
    * extend ≡ rebuild is the hash gate, promotions/merges included.
    * Same ε/minPts as q328, so the gate is literally q328's SQL. */
  val q338 = GQuery(
    "q338_incremental_dbscan",
    (s, d) => {
      val pts = embeddings(s, d).select(col("vec_id"),
        floor(element_at(col("embedding"), 1).cast("double") * 1e6 + lit(0.5))
          .cast("long").as("x"),
        floor(element_at(col("embedding"), 2).cast("double") * 1e6 + lit(0.5))
          .cast("long").as("y"))
      val base = pts.filter(col("vec_id") % 10 =!= 0)
      val delta = pts.filter(col("vec_id") % 10 === 0)
      val idx = GridDbscan.index(base, "vec_id", "x", "y",
        epsScaled = 30000L, minPts = 10)
      val extended = GridDbscan.extend(idx, delta, "vec_id", "x", "y")
      GridDbscan.labels(extended)
        .groupBy(coalesce(col("cluster"), lit(-1L)).as("cluster"), col("role"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy(col("cluster"), col("role"))
    },
    Some(s"""WITH RECURSIVE $dbscanLabCtes
      |SELECT cluster, role, CAST(COUNT(*) AS BIGINT) AS n
      |FROM lab GROUP BY cluster, role ORDER BY cluster, role""".stripMargin))

  /** The ε=0.03/minPts=10 batch clustering as a LANDED artifact:
    * q328 produces it (producer-pays — the build cost stays on the
    * clustering query), q353's external evaluation probes it instead
    * of reclustering. Same seam as the q72/q95 and q214/q254 pairs. */
  private def dbscanLabels(s: org.apache.spark.sql.SparkSession, d: String,
                           probe: Boolean): org.apache.spark.sql.DataFrame = {
    def build = {
      val pts = embeddings(s, d).select(col("vec_id"),
        floor(element_at(col("embedding"), 1).cast("double") * 1e6 + lit(0.5))
          .cast("long").as("x"),
        floor(element_at(col("embedding"), 2).cast("double") * 1e6 + lit(0.5))
          .cast("long").as("y"))
      GridDbscan.cluster(pts, "vec_id", "x", "y",
        epsScaled = 30000L, minPts = 10)
    }
    if (probe) graft.core.Landed.probeOrBuild(s, s"dbscan-labels:$d")(build)
    else graft.core.Landed.land(s, s"dbscan-labels:$d")(build)
  }

  /** q353: external clustering evaluation — Adjusted Rand Index
    * (Hubert & Arabie 1985) and normalized mutual information of the
    * q328 DBSCAN clusters against the embedding table's ground-truth
    * labels: the scoring half of the clustering family (q328/q338
    * produce clusters; this says whether they MEAN anything). ARI is
    * pure pair-counting combinatorics — every C(·,2) and the
    * expected-index product stay exact integers (decimal-routed) with
    * ONE double division at the end; NMI's entropies are
    * DECIMAL(38,6)-routed p·ln p sums over the contingency frame.
    * Noise points are excluded and reported (ARI is defined over
    * clustered points; the noise bill is the DBSCAN-specific part of
    * the story). Everything after the clustering is contingency-
    * bounded (clusters × labels). */
  val q353 = GQuery(
    "q353_clustering_ari",
    (s, d) => {
      val lab = dbscanLabels(s, d, probe = true)
      val pl = lab.filter(col("role") =!= "noise")
        .join(embeddings(s, d).select(col("vec_id").as("id"),
          col("label").cast("long").as("l")), Seq("id"))
        .select(col("cluster"), col("l"))
      val cont = pl.groupBy(col("cluster"), col("l"))
        .agg(count(lit(1)).cast("long").as("nij"))
        .localCheckpoint(eager = false) // rows/cols/pair sums probe it
      val rows = cont.groupBy(col("cluster")).agg(sum(col("nij")).as("ri"))
      val cols = cont.groupBy(col("l")).agg(sum(col("nij")).as("cj"))
      val nEx = lab.filter(col("role") === "noise")
        .agg(count(lit(1)).cast("long").as("n_noise"))
      // C(x,2) on the integer path (x·(x−1) is even, so div 2 is exact);
      // the SUM is decimal-routed past int64
      def choose2Sum(c: String) =
        sum(expr(s"CAST((($c) * (($c) - 1)) div 2 AS DECIMAL(38,0))"))
      val parts = cont.agg(choose2Sum("nij").as("a"), sum(col("nij")).as("n"))
      val sr = rows.agg(choose2Sum("ri").as("sr"),
        count(lit(1)).cast("long").as("n_clusters"))
      val sc = cols.agg(choose2Sum("cj").as("sc"))
      // NMI pieces: entropies + mutual information, decimal-routed
      val withMarg = cont
        .join(broadcast(rows), Seq("cluster"))
        .join(broadcast(cols), Seq("l"))
        .crossJoin(broadcast(parts.select(col("n"))))
      val mi = withMarg.agg(dsum(
        (col("nij").cast("double") / col("n").cast("double"))
          * log(col("n").cast("double") * col("nij").cast("double")
            / (col("ri").cast("double") * col("cj").cast("double"))))
        .as("mi"))
      val hc = rows.crossJoin(broadcast(parts.select(col("n"))))
        .agg(dsum(-(col("ri").cast("double") / col("n").cast("double"))
          * log(col("ri").cast("double") / col("n").cast("double"))).as("hc"))
      val hl = cols.crossJoin(broadcast(parts.select(col("n"))))
        .agg(dsum(-(col("cj").cast("double") / col("n").cast("double"))
          * log(col("cj").cast("double") / col("n").cast("double"))).as("hl"))
      parts.crossJoin(broadcast(sr)).crossJoin(broadcast(sc))
        .crossJoin(broadcast(nEx)).crossJoin(broadcast(mi))
        .crossJoin(broadcast(hc)).crossJoin(broadcast(hl))
        .withColumn("total", expr("CAST((n * (n - 1)) div 2 AS DECIMAL(38,0))"))
        .withColumn("exp_idx",
          col("sr").cast("double") * col("sc").cast("double")
            / col("total").cast("double"))
        .select(col("n").as("n_points"), col("n_noise"), col("n_clusters"),
          round(when(
            (col("sr").cast("double") + col("sc").cast("double")) / 2.0
              - col("exp_idx") =!= 0.0,
            (col("a").cast("double") - col("exp_idx"))
              / ((col("sr").cast("double") + col("sc").cast("double")) / 2.0
                - col("exp_idx"))), 6).as("ari"),
          round(when(col("hc") > 0 && col("hl") > 0,
            col("mi") / sqrt(col("hc") * col("hl"))), 6).as("nmi"))
    },
    Some(s"""WITH RECURSIVE $dbscanLabCtes,
      |pl AS (
      |  SELECT l.cluster, CAST(e.label AS BIGINT) AS lbl
      |  FROM lab l JOIN embeddings e ON l.id = e.vec_id
      |  WHERE l.role <> 'noise'),
      |cont AS (
      |  SELECT cluster, lbl, CAST(COUNT(*) AS BIGINT) AS nij
      |  FROM pl GROUP BY cluster, lbl),
      |rws AS (SELECT cluster, CAST(SUM(nij) AS BIGINT) AS ri
      |  FROM cont GROUP BY cluster),
      |cls AS (SELECT lbl, CAST(SUM(nij) AS BIGINT) AS cj
      |  FROM cont GROUP BY lbl),
      |nx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_noise FROM lab
      |  WHERE role = 'noise'),
      |parts AS (
      |  SELECT SUM(CAST(nij AS HUGEINT) * (nij - 1) // 2) AS a,
      |    CAST(SUM(nij) AS BIGINT) AS n
      |  FROM cont),
      |srt AS (SELECT SUM(CAST(ri AS HUGEINT) * (ri - 1) // 2) AS sr,
      |  CAST(COUNT(*) AS BIGINT) AS n_clusters FROM rws),
      |sct AS (SELECT SUM(CAST(cj AS HUGEINT) * (cj - 1) // 2) AS sc
      |  FROM cls),
      |mi AS (
      |  SELECT CAST(SUM(CAST(
      |      (CAST(co.nij AS DOUBLE) / CAST(p2.n AS DOUBLE))
      |      * ln(CAST(p2.n AS DOUBLE) * CAST(co.nij AS DOUBLE)
      |        / (CAST(r.ri AS DOUBLE) * CAST(c2.cj AS DOUBLE)))
      |    AS DECIMAL(38,6))) AS DOUBLE) AS mi
      |  FROM cont co JOIN rws r ON co.cluster = r.cluster
      |  JOIN cls c2 ON co.lbl = c2.lbl CROSS JOIN parts p2),
      |hc AS (
      |  SELECT CAST(SUM(CAST(
      |      -(CAST(ri AS DOUBLE) / CAST(p2.n AS DOUBLE))
      |      * ln(CAST(ri AS DOUBLE) / CAST(p2.n AS DOUBLE))
      |    AS DECIMAL(38,6))) AS DOUBLE) AS hc
      |  FROM rws CROSS JOIN parts p2),
      |hl AS (
      |  SELECT CAST(SUM(CAST(
      |      -(CAST(cj AS DOUBLE) / CAST(p2.n AS DOUBLE))
      |      * ln(CAST(cj AS DOUBLE) / CAST(p2.n AS DOUBLE))
      |    AS DECIMAL(38,6))) AS DOUBLE) AS hl
      |  FROM cls CROSS JOIN parts p2)
      |SELECT p2.n AS n_points, nx.n_noise, srt.n_clusters,
      |  round(CASE WHEN (CAST(srt.sr AS DOUBLE) + CAST(sct.sc AS DOUBLE))
      |      / 2.0 - CAST(srt.sr AS DOUBLE) * CAST(sct.sc AS DOUBLE)
      |      / CAST(CAST(p2.n AS HUGEINT) * (p2.n - 1) // 2 AS DOUBLE) <> 0.0
      |    THEN (CAST(p2.a AS DOUBLE)
      |      - CAST(srt.sr AS DOUBLE) * CAST(sct.sc AS DOUBLE)
      |        / CAST(CAST(p2.n AS HUGEINT) * (p2.n - 1) // 2 AS DOUBLE))
      |    / ((CAST(srt.sr AS DOUBLE) + CAST(sct.sc AS DOUBLE)) / 2.0
      |      - CAST(srt.sr AS DOUBLE) * CAST(sct.sc AS DOUBLE)
      |        / CAST(CAST(p2.n AS HUGEINT) * (p2.n - 1) // 2 AS DOUBLE))
      |    END, 6) AS ari,
      |  round(CASE WHEN hc.hc > 0 AND hl.hl > 0
      |    THEN mi.mi / sqrt(hc.hc * hl.hl) END, 6) AS nmi
      |FROM parts p2 CROSS JOIN srt CROSS JOIN sct CROSS JOIN nx
      |CROSS JOIN mi CROSS JOIN hc CROSS JOIN hl""".stripMargin))

  /** q361: geometric median per label (Weiszfeld 1937, 3 unrolled
    * iterations from the exact centroid) — the 2-D robust center the
    * Huber estimator (q355) is in 1-D: the L1-optimal point a few
    * far-flung embeddings cannot drag the way they drag the centroid.
    * Each iteration reweights every point by 1/distance-to-current
    * (zero-distance points are at the optimum — their infinite weight
    * is expressed by SKIPPING them, the standard Weiszfeld guard) and
    * recenters with decimal-routed weighted sums; the 10-row center
    * frame broadcasts back, three passes over the landed points.
    * Output per label: centroid, geometric median, and the
    * centroid→median shift (the outlier drag Weiszfeld removed). */
  val q361 = GQuery(
    "q361_geometric_median",
    (s, d) => {
      val pts = embeddings(s, d).select(col("label").cast("long").as("l"),
          element_at(col("embedding"), 1).cast("double").as("x"),
          element_at(col("embedding"), 2).cast("double").as("y"))
        .localCheckpoint(eager = false) // centroid + 3 Weiszfeld passes
      var cur = pts.groupBy(col("l"))
        .agg(count(lit(1)).cast("long").as("n"),
          (dsum(col("x")) / count(lit(1))).as("mx"),
          (dsum(col("y")) / count(lit(1))).as("my"))
        .withColumn("cx", col("mx")).withColumn("cy", col("my"))
      for (_ <- 1 to 3) {
        val dist = sqrt((col("x") - col("cx")) * (col("x") - col("cx"))
          + (col("y") - col("cy")) * (col("y") - col("cy")))
        cur = pts.join(broadcast(cur), Seq("l"))
          .withColumn("dist", dist)
          .filter(col("dist") > 0)
          .groupBy(col("l"), col("n"), col("mx"), col("my"))
          .agg(
            (dsum(col("x") / col("dist")) / dsum(lit(1.0) / col("dist")))
              .as("nx"),
            (dsum(col("y") / col("dist")) / dsum(lit(1.0) / col("dist")))
              .as("ny"))
          .select(col("l"), col("n"), col("mx"), col("my"),
            col("nx").as("cx"), col("ny").as("cy"))
      }
      cur.select(col("l").as("label"), col("n"),
          round(col("mx"), 6).as("centroid_x"),
          round(col("my"), 6).as("centroid_y"),
          round(col("cx"), 6).as("gmedian_x"),
          round(col("cy"), 6).as("gmedian_y"),
          round(sqrt((col("cx") - col("mx")) * (col("cx") - col("mx"))
            + (col("cy") - col("my")) * (col("cy") - col("my"))), 6)
            .as("shift"))
        .orderBy(col("label"))
    },
    Some {
      val dsql = (x: String) => s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"
      def step(k: Int): String =
        s"""w$k AS (
           |  SELECT p.l, c.n, c.mx, c.my,
           |    ${dsql(s"p.x / sqrt((p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy))")}
           |      / ${dsql(s"1.0 / sqrt((p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy))")}
           |      AS cx,
           |    ${dsql(s"p.y / sqrt((p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy))")}
           |      / ${dsql(s"1.0 / sqrt((p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy))")}
           |      AS cy
           |  FROM pts p JOIN w${k - 1} c ON p.l = c.l
           |  WHERE sqrt((p.x - c.cx) * (p.x - c.cx)
           |    + (p.y - c.cy) * (p.y - c.cy)) > 0
           |  GROUP BY p.l, c.n, c.mx, c.my)""".stripMargin
      s"""WITH pts AS (
         |  SELECT CAST(label AS BIGINT) AS l,
         |    CAST(embedding[1] AS DOUBLE) AS x,
         |    CAST(embedding[2] AS DOUBLE) AS y
         |  FROM embeddings),
         |w0 AS (
         |  SELECT l, CAST(COUNT(*) AS BIGINT) AS n,
         |    ${dsql("x")} / COUNT(*) AS mx, ${dsql("y")} / COUNT(*) AS my,
         |    ${dsql("x")} / COUNT(*) AS cx, ${dsql("y")} / COUNT(*) AS cy
         |  FROM pts GROUP BY l),
         |${step(1)},
         |${step(2)},
         |${step(3)}
         |SELECT l AS label, n, round(mx, 6) AS centroid_x,
         |  round(my, 6) AS centroid_y, round(cx, 6) AS gmedian_x,
         |  round(cy, 6) AS gmedian_y,
         |  round(sqrt((cx - mx) * (cx - mx) + (cy - my) * (cy - my)), 6)
         |    AS shift
         |FROM w3 ORDER BY label""".stripMargin
    })

  /** q345: entropic optimal transport via Sinkhorn–Knopp (Cuturi
    * 2013, 5 unrolled iterations, ε = 1) between the label
    * distributions of the even- and odd-id embedding halves — the
    * GENERAL-cost upgrade over the 1-D ordered EMD the governance
    * audits use (q287): EMD's closed form only exists for ordered
    * scalars; Sinkhorn prices any label×label cost matrix (here
    * c_ij = |i−j|) and is THE distribution-matching tool of the
    * embedding era. Marginals land once (label-bounded); K = e^(−c)
    * lives on the labels² frame; each scaling step is one
    * matrix–vector product with DECIMAL(38,18)-routed sums
    * (order-independent — the 1000-executor requirement), lazily
    * checkpointed so the 10-step chain stays linear. Output: the
    * transport cost and the worst row-marginal error after 5
    * rounds (the convergence certificate). */
  val q345 = {
    val iters = 5
    def sqlIter(k: Int): String = {
      val pu = if (k == 1) "u0" else s"u${k - 1}"
      s"""v$k AS (
         |  SELECT m.l AS j, m.b / CAST(SUM(CAST(kk.k * u.u AS DECIMAL(38,18)))
         |    AS DOUBLE) AS v
         |  FROM kk JOIN $pu u ON kk.i = u.i JOIN marg m ON kk.j = m.l
         |  GROUP BY m.l, m.b),
         |u$k AS (
         |  SELECT m.l AS i, m.a / CAST(SUM(CAST(kk.k * v.v AS DECIMAL(38,18)))
         |    AS DOUBLE) AS u
         |  FROM kk JOIN v$k v ON kk.j = v.j JOIN marg m ON kk.i = m.l
         |  GROUP BY m.l, m.a)""".stripMargin
    }
    GQuery(
      "q345_sinkhorn_transport",
      (s, d) => {
        val dec18 = org.apache.spark.sql.types.DecimalType(38, 18)
        def dsum18(c: org.apache.spark.sql.Column) =
          sum(c.cast(dec18)).cast("double")
        val pts = embeddings(s, d).select(col("label").cast("long").as("l"),
          (col("vec_id") % 2 === 0).as("isA"))
        val counts = pts.groupBy(col("l")).agg(
          coalesce(sum(when(col("isA"), 1L)), lit(0L)).as("na"),
          coalesce(sum(when(!col("isA"), 1L)), lit(0L)).as("nb"))
        val tot = counts.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
        val marg = counts.crossJoin(broadcast(tot))
          .select(col("l"),
            (col("na").cast("double") / col("ta").cast("double")).as("a"),
            (col("nb").cast("double") / col("tb").cast("double")).as("b"))
          .localCheckpoint(eager = false) // K, every step and the cost probe it
        val kk = marg.select(col("l").as("i")).crossJoin(
            marg.select(col("l").as("j")))
          .select(col("i"), col("j"),
            exp(-abs(col("i") - col("j")).cast("double")).as("k"),
            abs(col("i") - col("j")).cast("double").as("c"))
          .localCheckpoint(eager = false)
        var u = marg.select(col("l").as("i"), lit(1.0).as("u"))
        var v: org.apache.spark.sql.DataFrame = null
        for (_ <- 1 to iters) {
          v = kk.join(u, Seq("i"))
            .groupBy(col("j")).agg(dsum18(col("k") * col("u")).as("s"))
            .join(marg.select(col("l").as("j"), col("b")), Seq("j"))
            .select(col("j"), (col("b") / col("s")).as("v"))
            .localCheckpoint(eager = false)
          u = kk.join(v, Seq("j"))
            .groupBy(col("i")).agg(dsum18(col("k") * col("v")).as("s"))
            .join(marg.select(col("l").as("i"), col("a")), Seq("i"))
            .select(col("i"), (col("a") / col("s")).as("u"))
            .localCheckpoint(eager = false)
        }
        val plan = kk.join(u, Seq("i")).join(v, Seq("j"))
          .select(col("i"), col("j"),
            (col("u") * col("k") * col("v")).as("p"), col("c"))
          .localCheckpoint(eager = false) // cost + marginal check probe it
        val cost = plan.agg(dsum18(col("p") * col("c")).as("ot_cost"))
        val margErr = plan.groupBy(col("i")).agg(dsum18(col("p")).as("rowm"))
          .join(marg.select(col("l").as("i"), col("a")), Seq("i"))
          .agg(max(abs(col("rowm") - col("a"))).as("max_marg_err"))
        val nl = marg.agg(count(lit(1)).cast("long").as("n_labels"))
        nl.crossJoin(broadcast(cost)).crossJoin(broadcast(margErr))
          .select(col("n_labels"), round(col("ot_cost"), 6).as("ot_cost"),
            round(col("max_marg_err"), 6).as("max_marg_err"))
      },
      Some(s"""WITH pts AS (
        |  SELECT CAST(label AS BIGINT) AS l, (vec_id % 2 = 0) AS isa
        |  FROM embeddings),
        |counts AS (
        |  SELECT l,
        |    COALESCE(CAST(SUM(CASE WHEN isa THEN 1 END) AS BIGINT), 0) AS na,
        |    COALESCE(CAST(SUM(CASE WHEN NOT isa THEN 1 END) AS BIGINT), 0)
        |      AS nb
        |  FROM pts GROUP BY l),
        |tot AS (SELECT CAST(SUM(na) AS BIGINT) AS ta,
        |  CAST(SUM(nb) AS BIGINT) AS tb FROM counts),
        |marg AS (
        |  SELECT l, CAST(na AS DOUBLE) / CAST(t.ta AS DOUBLE) AS a,
        |    CAST(nb AS DOUBLE) / CAST(t.tb AS DOUBLE) AS b
        |  FROM counts CROSS JOIN tot t),
        |kk AS (
        |  SELECT mi.l AS i, mj.l AS j,
        |    exp(-CAST(abs(mi.l - mj.l) AS DOUBLE)) AS k,
        |    CAST(abs(mi.l - mj.l) AS DOUBLE) AS c
        |  FROM marg mi CROSS JOIN marg mj),
        |u0 AS (SELECT l AS i, 1.0 AS u FROM marg),
        |${(1 to iters).map(sqlIter).mkString(",\n")},
        |plan AS (
        |  SELECT kk.i, kk.j, u.u * kk.k * v.v AS p, kk.c
        |  FROM kk JOIN u$iters u ON kk.i = u.i JOIN v$iters v ON kk.j = v.j),
        |cost AS (
        |  SELECT CAST(SUM(CAST(p * c AS DECIMAL(38,18))) AS DOUBLE)
        |    AS ot_cost FROM plan),
        |merr AS (
        |  SELECT MAX(abs(rowm - a)) AS max_marg_err FROM (
        |    SELECT pl.i, CAST(SUM(CAST(pl.p AS DECIMAL(38,18))) AS DOUBLE)
        |      AS rowm
        |    FROM plan pl GROUP BY pl.i) r
        |  JOIN marg m ON r.i = m.l),
        |nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_labels FROM marg)
        |SELECT nl.n_labels, round(c.ot_cost, 6) AS ot_cost,
        |  round(e.max_marg_err, 6) AS max_marg_err
        |FROM nl CROSS JOIN cost c CROSS JOIN merr e""".stripMargin))
  }

  /** q337: semi-hard triplet mining census (FaceNet, Schroff et al.
    * 2015) — the contrastive-training-data miner over the labeled
    * embedding table: for each anchor, positives share its label,
    * negatives don't, and the SEMI-HARD band keeps negatives that are
    * farther than the positive but inside the margin
    * (d²_ap < d²_an < d²_ap + M² — the squared-distance variant, all
    * integer on the e6-scaled 2-D projection). Candidates come from
    * same-grid-cell pairs only (the q328 cell trick — mining stays
    * bucket-local, never corpus²); the census reports per label the
    * anchors with at least one semi-hard triplet and the triplet
    * mass, beside the raw pair bill. Cell width 0.05, margin² 10⁹. */
  val q337 = GQuery(
    "q337_triplet_mining",
    (s, d) => {
      val pts = embeddings(s, d).select(col("vec_id"), col("label"),
          floor(element_at(col("embedding"), 1).cast("double") * 1e6 + lit(0.5))
            .cast("long").as("x"),
          floor(element_at(col("embedding"), 2).cast("double") * 1e6 + lit(0.5))
            .cast("long").as("y"))
        .withColumn("cx", expr("(x + 1000000000L) div 50000L"))
        .withColumn("cy", expr("(y + 1000000000L) div 50000L"))
        .localCheckpoint(eager = false) // both pair arms probe it
      val a = pts.select(col("vec_id").as("ida"), col("label").as("la"),
        col("x").as("xa"), col("y").as("ya"), col("cx"), col("cy"))
      val b = pts.select(col("vec_id").as("idb"), col("label").as("lb"),
        col("x").as("xb"), col("y").as("yb"), col("cx"), col("cy"))
      val pairs = a.join(b, Seq("cx", "cy"))
        .filter(col("ida") =!= col("idb"))
        .select(col("ida"), col("la"),
          (col("lb") === col("la")).as("same"),
          ((col("xa") - col("xb")) * (col("xa") - col("xb"))
            + (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("d2"))
      val ap = pairs.filter(col("same"))
        .select(col("ida"), col("la"), col("d2").as("d2_ap"))
      val an = pairs.filter(!col("same"))
        .select(col("ida"), col("d2").as("d2_an"))
      val trip = ap.join(an, Seq("ida"))
        .filter(col("d2_an") > col("d2_ap")
          && col("d2_an") < col("d2_ap") + lit(1000000000L))
      val censusT = trip.groupBy(col("la").as("label"))
        .agg(countDistinct(col("ida")).cast("long").as("n_anchors"),
          count(lit(1)).cast("long").as("n_triplets"))
      val censusP = pairs.groupBy(col("la").as("label"))
        .agg(coalesce(sum(when(col("same"), 1L)), lit(0L)).as("n_ap_pairs"),
          coalesce(sum(when(!col("same"), 1L)), lit(0L)).as("n_an_pairs"))
      censusP.join(censusT, Seq("label"), "left")
        .select(col("label"), col("n_ap_pairs"), col("n_an_pairs"),
          coalesce(col("n_anchors"), lit(0L)).as("n_anchors"),
          coalesce(col("n_triplets"), lit(0L)).as("n_triplets"))
        .orderBy(col("label"))
    },
    Some("""WITH pts AS (
      |  SELECT vec_id, label,
      |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0 + 0.5)
      |      AS BIGINT) AS x,
      |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000.0 + 0.5)
      |      AS BIGINT) AS y
      |  FROM embeddings),
      |c AS (
      |  SELECT vec_id, label, x, y, (x + 1000000000) // 50000 AS cx,
      |    (y + 1000000000) // 50000 AS cy FROM pts),
      |pairs AS (
      |  SELECT a.vec_id AS ida, a.label AS la, (b.label = a.label) AS same,
      |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      |  FROM c a JOIN c b ON a.cx = b.cx AND a.cy = b.cy
      |   AND a.vec_id <> b.vec_id),
      |ap AS (SELECT ida, la, d2 AS d2_ap FROM pairs WHERE same),
      |an AS (SELECT ida, d2 AS d2_an FROM pairs WHERE NOT same),
      |trip AS (
      |  SELECT ap.ida, ap.la FROM ap JOIN an ON ap.ida = an.ida
      |  WHERE an.d2_an > ap.d2_ap AND an.d2_an < ap.d2_ap + 1000000000),
      |ct AS (
      |  SELECT la AS label, CAST(COUNT(DISTINCT ida) AS BIGINT) AS n_anchors,
      |    CAST(COUNT(*) AS BIGINT) AS n_triplets
      |  FROM trip GROUP BY la),
      |cp AS (
      |  SELECT la AS label,
      |    COALESCE(CAST(SUM(CASE WHEN same THEN 1 END) AS BIGINT), 0)
      |      AS n_ap_pairs,
      |    COALESCE(CAST(SUM(CASE WHEN NOT same THEN 1 END) AS BIGINT), 0)
      |      AS n_an_pairs
      |  FROM pairs GROUP BY la)
      |SELECT cp.label, cp.n_ap_pairs, cp.n_an_pairs,
      |  COALESCE(ct.n_anchors, 0) AS n_anchors,
      |  COALESCE(ct.n_triplets, 0) AS n_triplets
      |FROM cp LEFT JOIN ct ON cp.label = ct.label ORDER BY cp.label""".stripMargin))

  /** q379: MAUVE-lite divergence frontier (Pillutla et al. 2021
    * shape) — the generative-eval metric comparing a "model" and a
    * "human" embedding distribution: both label-parity populations
    * quantize onto the q328 grid cells (the histogram-compression
    * move — at 100 TB the KL runs over the bounded cell frame, never
    * the points), and for mixture weights λ ∈ {¼, ½, ¾} the frontier
    * point is (KL(P‖R_λ), KL(Q‖R_λ)) with R = λP+(1−λ)Q. One
    * fact-scale grouped pass; the λ sweep is a bounded crossJoin;
    * ln terms are high-entropy so decimal-routed sums are
    * boundary-safe. */
  val q379 = GQuery(
    "q379_mauve_frontier",
    (s, d) => {
      val pts = embeddings(s, d).select(
        (col("label") % 2 === 0).as("isP"),
        floor(element_at(col("embedding"), 1).cast("double") * 1e6 + 0.5)
          .cast("long").as("x"),
        floor(element_at(col("embedding"), 2).cast("double") * 1e6 + 0.5)
          .cast("long").as("y"))
      val cells = pts
        .select(col("isP"), expr("(x + 1000000000) div 30000").as("cx"),
          expr("(y + 1000000000) div 30000").as("cy"))
        .groupBy(col("cx"), col("cy"))
        .agg(coalesce(sum(when(col("isP"), 1L)), lit(0L)).as("np"),
          coalesce(sum(when(!col("isP"), 1L)), lit(0L)).as("nq"))
      val tot = cells.agg(sum(col("np")).as("tp"), sum(col("nq")).as("tq"))
      val lam = tot.select(explode(array(lit(0.25), lit(0.5), lit(0.75)))
        .as("lambda"))
      cells.crossJoin(broadcast(tot)).crossJoin(broadcast(lam))
        .withColumn("p", col("np").cast("double") / col("tp"))
        .withColumn("q", col("nq").cast("double") / col("tq"))
        .withColumn("r", col("lambda") * col("p")
          + (lit(1.0) - col("lambda")) * col("q"))
        .groupBy(col("lambda"))
        .agg(graft.core.Exact.lcount(lit(1)).as("n_cells"),
          dsum(when(col("np") > 0, col("p") * log(col("p") / col("r")))
            .otherwise(lit(0.0))).as("klp"),
          dsum(when(col("nq") > 0, col("q") * log(col("q") / col("r")))
            .otherwise(lit(0.0))).as("klq"))
        .select(col("lambda"), col("n_cells"),
          round(col("klp"), 6).as("kl_p"), round(col("klq"), 6).as("kl_q"))
        .orderBy(col("lambda"))
    },
    Some("""WITH pts AS (
      |  SELECT (label % 2 = 0) AS isP,
      |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0 + 0.5)
      |      AS BIGINT) AS x,
      |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000.0 + 0.5)
      |      AS BIGINT) AS y
      |  FROM embeddings),
      |cells AS (
      |  SELECT (x + 1000000000) // 30000 AS cx,
      |    (y + 1000000000) // 30000 AS cy,
      |    COALESCE(CAST(SUM(CASE WHEN isP THEN 1 END) AS BIGINT), 0) AS np,
      |    COALESCE(CAST(SUM(CASE WHEN NOT isP THEN 1 END) AS BIGINT), 0)
      |      AS nq
      |  FROM pts GROUP BY 1, 2),
      |tot AS (
      |  SELECT CAST(SUM(np) AS BIGINT) AS tp, CAST(SUM(nq) AS BIGINT) AS tq
      |  FROM cells),
      |lam AS (SELECT CAST(unnest([0.25, 0.5, 0.75]) AS DOUBLE) AS lambda),
      |j AS (
      |  SELECT c.np, c.nq, l.lambda,
      |    CAST(c.np AS DOUBLE) / t.tp AS p,
      |    CAST(c.nq AS DOUBLE) / t.tq AS q
      |  FROM cells c CROSS JOIN tot t CROSS JOIN lam l),
      |k AS (
      |  SELECT lambda, np, nq, p, q,
      |    lambda * p + (1.0 - lambda) * q AS r
      |  FROM j)
      |SELECT lambda, CAST(COUNT(*) AS BIGINT) AS n_cells,
      |  round(CAST(SUM(CAST((CASE WHEN np > 0 THEN p * ln(p / r)
      |    ELSE 0.0 END) AS DECIMAL(38,6))) AS DOUBLE), 6) AS kl_p,
      |  round(CAST(SUM(CAST((CASE WHEN nq > 0 THEN q * ln(q / r)
      |    ELSE 0.0 END) AS DECIMAL(38,6))) AS DOUBLE), 6) AS kl_q
      |FROM k GROUP BY lambda ORDER BY lambda""".stripMargin))

  /** q401: orthogonal Procrustes alignment of two embedding versions
    * (Schönemann 1966) — the rotation-aware companion of q248's MMD
    * drift: after a re-train, how much "drift" is a pure rotation the
    * downstream consumer can undo? Version B is a deterministic 30°
    * rotation + structured offset of A's 2-D projection; the optimal
    * angle has the closed 2-D form θ̂ = atan2(Σ(x·y′−y·x′),
    * Σ(x·x′+y·y′)) over CENTERED pairs (exact decimal moments, one
    * atan2), and the census reports the recovered angle with the
    * pre/post-alignment MSE — post ≈ the un-rotatable residual. */
  val q401 = GQuery(
    "q401_procrustes_drift",
    (s, d) => {
      val pts = embeddings(s, d).select(col("vec_id"),
          element_at(col("embedding"), 1).cast("double").as("x"),
          element_at(col("embedding"), 2).cast("double").as("y"))
        .withColumn("bx",
          cos(lit(math.Pi) / 6) * col("x") - sin(lit(math.Pi) / 6) * col("y")
            + ((col("vec_id") % 7) - 3).cast("double") / 1000)
        .withColumn("by",
          sin(lit(math.Pi) / 6) * col("x") + cos(lit(math.Pi) / 6) * col("y")
            + ((col("vec_id") % 5) - 2).cast("double") / 1000)
      val mu = pts.agg(graft.core.Exact.lcount(lit(1)).as("n"),
        (dsum(col("x")) / count(lit(1))).as("mx"),
        (dsum(col("y")) / count(lit(1))).as("my"),
        (dsum(col("bx")) / count(lit(1))).as("mbx"),
        (dsum(col("by")) / count(lit(1))).as("mby"))
      val c = pts.crossJoin(broadcast(mu))
        .select(col("n"), (col("x") - col("mx")).as("cx"),
          (col("y") - col("my")).as("cy"),
          (col("bx") - col("mbx")).as("cbx"),
          (col("by") - col("mby")).as("cby"))
      val m = c.groupBy(col("n")).agg(
        dsum(col("cx") * col("cby") - col("cy") * col("cbx")).as("snum"),
        dsum(col("cx") * col("cbx") + col("cy") * col("cby")).as("sden"),
        dsum((col("cx") - col("cbx")) * (col("cx") - col("cbx"))
          + (col("cy") - col("cby")) * (col("cy") - col("cby"))).as("ssepre"),
        dsum(col("cx") * col("cx") + col("cy") * col("cy")).as("saa"),
        dsum(col("cbx") * col("cbx") + col("cby") * col("cby")).as("sbb"))
      m.withColumn("theta", atan2(col("snum"), col("sden")))
        // post-alignment SSE has the closed form Σ|a|² + Σ|b|²
        // − 2·√(num² + den²) (rotating a by θ̂ maximizes the inner
        // product to exactly the vector norm of (num, den))
        .select(col("n"),
          round(col("theta") * 180 / lit(math.Pi), 6).as("theta_deg"),
          round(col("ssepre") / col("n"), 9).as("mse_pre"),
          round((col("saa") + col("sbb")
            - lit(2.0) * sqrt(col("snum") * col("snum")
              + col("sden") * col("sden"))) / col("n"), 9).as("mse_post"))
    },
    Some(s"""WITH pts AS (
      |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
      |    CAST(embedding[2] AS DOUBLE) AS y
      |  FROM embeddings),
      |b AS (
      |  SELECT vec_id, x, y,
      |    cos(pi() / 6) * x - sin(pi() / 6) * y
      |      + CAST((vec_id % 7) - 3 AS DOUBLE) / 1000 AS bx,
      |    sin(pi() / 6) * x + cos(pi() / 6) * y
      |      + CAST((vec_id % 5) - 2 AS DOUBLE) / 1000 AS by
      |  FROM pts),
      |mu AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    ${graft.core.Exact.sqlDsum("x")} / COUNT(*) AS mx, ${graft.core.Exact.sqlDsum("y")} / COUNT(*) AS my,
      |    ${graft.core.Exact.sqlDsum("bx")} / COUNT(*) AS mbx,
      |    ${graft.core.Exact.sqlDsum("by")} / COUNT(*) AS mby
      |  FROM b),
      |c AS (
      |  SELECT mu.n, b.x - mu.mx AS cx, b.y - mu.my AS cy,
      |    b.bx - mu.mbx AS cbx, b.by - mu.mby AS cby
      |  FROM b CROSS JOIN mu),
      |m AS (
      |  SELECT n, ${graft.core.Exact.sqlDsum("cx * cby - cy * cbx")} AS snum,
      |    ${graft.core.Exact.sqlDsum("cx * cbx + cy * cby")} AS sden,
      |    ${graft.core.Exact.sqlDsum("(cx - cbx) * (cx - cbx) + (cy - cby) * (cy - cby)")}
      |      AS ssepre,
      |    ${graft.core.Exact.sqlDsum("cx * cx + cy * cy")} AS saa,
      |    ${graft.core.Exact.sqlDsum("cbx * cbx + cby * cby")} AS sbb
      |  FROM c GROUP BY n)
      |SELECT n, round(atan2(snum, sden) * 180 / pi(), 6) AS theta_deg,
      |  round(ssepre / n, 9) AS mse_pre,
      |  round((saa + sbb - 2.0 * sqrt(snum * snum + sden * sden)) / n, 9)
      |    AS mse_post
      |FROM m""".stripMargin))

  def queries: Seq[GQuery] = Seq(q40, q41, q42, q48, q53, q102, q105, q114, q117, q119, q122, q131, q147, q173, q176, q186, q188, q226, q248, q251, q253, q255, q257, q261, q269, q313, q328, q337, q338, q345, q353, q361, q379, q401)
}
