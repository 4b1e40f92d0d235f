package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Approximate-nearest-neighbour search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline and
  * a random-hyperplane LSH bucketed variant as the scale path.
  *
  * Numeric determinism at integer speed: float summation is
  * order-dependent, so every dot product / norm is computed on
  * SCALED-LONG elements — `floor(x · 1e7 + 0.5)` per element (pure IEEE
  * arithmetic, identical in any engine; 1e-7 granularity ≈ float32 ULP
  * at unit scale), products and sums in int64, which is exact and
  * associative, one final double division by 1e14. Results are
  * bit-identical at any parallelism and reproducible by any engine —
  * like the earlier DECIMAL route, but at int64-add cost instead of
  * per-row BigDecimal allocation (~7× faster, measured).
  *
  * Range precondition (documented, generous): dim · (max|x|·1e7)² must
  * stay below 2^63 — for 64-dim embeddings that allows |x| up to ~33;
  * normalized embeddings sit 50× inside the bound.
  *
  * Plan shape: dots are PER-PAIR array folds (`zip_with` + `aggregate`,
  * whole-stage codegen) on candidate rows, not an (id, dim, element)
  * row explosion — a 64-dim dot is 64 long multiply-adds in a generated
  * loop instead of 64 shuffled rows through a hash aggregate.
  */
object Knn {
  /** Element scale: 1e7 (see class doc for the range bound). */
  val Scale = 1e7
  private val Scale2 = 1e14 // Scale², exact in double

  /** Scaled-long copy of a float-vector column: `array<long>`. */
  def scaledVec(vec: Column): Column =
    transform(vec, x => floor(x.cast(DoubleType) * lit(Scale) + lit(0.5)).cast("long"))

  /** Exact dot product of two scaled vectors, as double. The int64
    * fold runs in the native allocation-free [[graft.functions
    * .DotScaled]] expression (a per-pair `aggregate(zip_with(...))`
    * allocates an intermediate array per evaluated pair — swapping it
    * out took the q131 n×m scoring bench from 8.5 s to 1.2 s);
    * sessions built through [[graft.core.GraftSession]] have it
    * registered. */
  def dotScaled(a: Column, b: Column): Column =
    call_function("dot_scaled", a, b).cast(DoubleType) / lit(Scale2)

  /** Exact squared L2 norm of a scaled vector, as double. */
  def norm2Scaled(a: Column): Column = dotScaled(a, a)

  /** Brute-force cosine top-k: each query row (small side, broadcast)
    * against the full corpus — one corpus scan, per-row fold, one
    * window top-k per query; no shuffle besides the final per-qid
    * ranking. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), scaledVec(col(vecCol)).as("__cv"))
      .withColumn("nn2", norm2Scaled(col("__cv")))
    val q = queries.select(col(idCol).as("qid"), scaledVec(col(vecCol)).as("__qv"))
      .withColumn("qn2", norm2Scaled(col("__qv")))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("dot", dotScaled(col("__qv"), col("__cv")))
      .withColumn("cos", col("dot") / (sqrt(col("qn2")) * sqrt(col("nn2"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }

  /** Hard-negative mining — per query, the top-`k` most-similar corpus
    * rows whose cosine sits in a BAND `[loE9, hiE9]` (e9-floored
    * integer): above the band is a near-duplicate (useless as a
    * negative, poisonous if it's actually a positive), below it is a
    * random negative the model already separates. The close-but-not-
    * duplicate ring is what contrastive embedding training wants.
    * Same scan shape as [[bruteForceTopK]] (broadcast queries, one
    * corpus pass, per-query bounded window); the band filter runs
    * BEFORE the window, so ranking work tracks the ring, not the
    * corpus. Integer cosines make selection and order engine-exact. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, loE9: Long, hiE9: Long, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), scaledVec(col(vecCol)).as("__cv"))
      .withColumn("nn2", norm2Scaled(col("__cv")))
    val q = queries.select(col(idCol).as("qid"), scaledVec(col(vecCol)).as("__qv"))
      .withColumn("qn2", norm2Scaled(col("__qv")))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos_e9",
        floor(dotScaled(col("__qv"), col("__cv")) /
          (sqrt(col("qn2")) * sqrt(col("nn2"))) * lit(1e9) + lit(0.5)).cast("long"))
      .filter(col("cos_e9") >= loE9 && col("cos_e9") <= hiE9)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_e9").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos_e9"))
  }

  /** Near-dup pairs with cosine ≥ threshold within `df`: candidate
    * pairs come from the random-hyperplane LSH buckets (AND-OR,
    * `numTables` × `numPlanes` — see [[hyperplaneBuckets]]), then exact
    * scaled-long verification on candidates only. The pair join is
    * bucket-local — work scales with co-bucketed rows, never |df|², and
    * nothing is broadcast except the literal sign matrix. Recall < 1 by
    * construction (raise `numTables` to trade compute for recall; at
    * near-dup thresholds the collision probability per table is
    * (1−θ/π)^planes ≈ 1), but fully deterministic: any engine replaying
    * the same md5-derived hyperplanes derives the same buckets,
    * candidates, and cosines. [[cosinePairsExact]] is the all-pairs
    * reference for specs and small frames. */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  threshold: Double, numPlanes: Int = 6, numTables: Int = 4,
                  dim: Option[Int] = None): DataFrame = {
    // both sides of the bucket self-join derive from the hyperplane
    // projection pass (numPlanes·numTables dot products per vector) —
    // checkpoint it so the projection runs once
    val b = hyperplaneBuckets(df, idCol, vecCol, numPlanes, numTables, dim)
      .localCheckpoint(eager = true)
    val cand = b.select(col("id").as("va"), col("t"), col("bucket"))
      .join(b.select(col("id").as("vb"), col("t"), col("bucket")),
        Seq("t", "bucket"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb")).distinct()
    val v = df.select(col(idCol).as("__vid"), scaledVec(col(vecCol)).as("__v"))
      .withColumn("__n2", norm2Scaled(col("__v")))
    cand
      .join(v.select(col("__vid").as("va"), col("__v").as("__av"), col("__n2").as("na2")),
        Seq("va"))
      .join(v.select(col("__vid").as("vb"), col("__v").as("__bv"), col("__n2").as("nb2")),
        Seq("vb"))
      .withColumn("cos",
        dotScaled(col("__av"), col("__bv")) / (sqrt(col("na2")) * sqrt(col("nb2"))))
      .filter(col("cos") >= threshold)
      .select(col("va"), col("vb"), col("cos"))
  }

  /** SemDeDup-style semantic dedup keep-set: a row is DROPPED when any
    * smaller-id row sits within cosine ≥ `threshold` of it (among the
    * LSH candidate pairs of [[cosinePairs]]), KEPT otherwise — the
    * standard "keep the canonical representative" rule, made
    * deterministic by ordering on the id rather than on insertion
    * order. Output: one row per input id with `n_dups` (count of
    * smaller-id near neighbours) and `kept` (n_dups == 0).
    *
    * The rule is intentionally non-transitive: a row is judged against
    * ALL smaller-id neighbours, kept or not, so membership of each row
    * is independent of every other row's verdict — embarrassingly
    * parallel, no iterative clustering. (For transitive groups use
    * [[graft.dedup.Components]] over the pair list instead.) Plan:
    * bucket-local pair join (never |df|²) → per-vb count → one
    * broadcast-able left join back to the id set. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, numPlanes: Int = 6, numTables: Int = 4,
                    dim: Option[Int] = None): DataFrame = {
    val dups = cosinePairs(df, idCol, vecCol, threshold, numPlanes, numTables, dim)
      .groupBy(col("vb").as("__did")).agg(count(lit(1)).as("n_dups"))
    df.select(col(idCol))
      .join(dups, col(idCol) === col("__did"), "left")
      .select(col(idCol),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        (coalesce(col("n_dups"), lit(0L)) === 0).as("kept"))
  }

  /** Embedding-space decontamination, brute-force arm: per-corpus-row
    * verdict against a protected (benchmark) set — `max_cos_e9` over
    * EVERY protected row, `n_hits` at ≥ `thresholdE9`, `kept` when
    * none hit. The semantic complement of the exact/n-gram
    * decontaminators ([[graft.dedup.NgramDecon]]): it catches
    * paraphrased or re-templated eval leakage that shares no 13-gram.
    *
    * This arm multiplies the corpus scan by |benchmark| dot products
    * per row (a broadcast nested-loop), so it is the EXACT REFERENCE
    * for specs and small protected sets only; the production path is
    * [[embeddingDecontaminateLsh]], which probes the same verdict
    * through LSH buckets and does work proportional to candidate
    * pairs. Cosines are e9-floored integers over scaled-long dots, so
    * both arms' verdicts are engine-exact. */
  def embeddingDecontaminate(corpus: DataFrame, benchmark: DataFrame,
                             idCol: String, vecCol: String,
                             thresholdE9: Long): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), scaledVec(col(vecCol)).as("__cv"))
      .withColumn("cn2", norm2Scaled(col("__cv")))
    val b = benchmark.select(scaledVec(col(vecCol)).as("__bv"))
      .withColumn("bn2", norm2Scaled(col("__bv")))
    c.crossJoin(broadcast(b))
      .withColumn("cos_e9",
        floor(dotScaled(col("__cv"), col("__bv")) /
          (sqrt(col("cn2")) * sqrt(col("bn2"))) * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("id"))
      .agg(
        max(col("cos_e9")).as("max_cos_e9"),
        count(when(col("cos_e9") >= thresholdE9, 1)).as("n_hits"))
      .withColumn("kept", col("n_hits") === 0L)
  }

  /** Embedding-space decontamination, LSH-probed arm — the 100 TB
    * path: candidate (corpus, protected) pairs come from shared
    * [[hyperplaneBuckets]] (AND-OR, `numTables` × `numPlanes`), exact
    * scaled-long cosines score CANDIDATES ONLY, and rows with no
    * co-bucketed protected vector keep a NULL `max_cos_e9` (nothing
    * was measured) with `n_hits` 0. Work scales with co-bucketed
    * pairs, never |corpus|·|benchmark|; the only broadcasts are the
    * benchmark buckets and vectors. An EXACT duplicate of a protected
    * vector projects identically on every hyperplane, so true leaks
    * always share all buckets with their source — recall loss only
    * affects the partial-similarity band, and is measured in KnnSpec
    * against [[embeddingDecontaminate]]. Deterministic: md5-derived
    * hyperplanes, sequential double fold, e9-floored integer cosines
    * — any engine replays buckets, candidates and verdicts. */
  def embeddingDecontaminateLsh(corpus: DataFrame, benchmark: DataFrame,
                                idCol: String, vecCol: String,
                                thresholdE9: Long, numPlanes: Int = 6,
                                numTables: Int = 4,
                                dim: Option[Int] = None): DataFrame = {
    val d = Some(dim.getOrElse(inferDim(corpus, vecCol)))
    val cb = hyperplaneBuckets(corpus, idCol, vecCol, numPlanes, numTables, d)
      .select(col("id").as("cid"), col("t"), col("bucket"))
    val bb = hyperplaneBuckets(benchmark, idCol, vecCol, numPlanes, numTables, d)
      .select(col("id").as("pid"), col("t"), col("bucket"))
    val cand = cb.join(broadcast(bb), Seq("t", "bucket"))
      .select(col("cid"), col("pid")).distinct()
    val c = corpus.select(col(idCol).as("cid"), scaledVec(col(vecCol)).as("__cv"))
      .withColumn("cn2", norm2Scaled(col("__cv")))
    val b = benchmark.select(col(idCol).as("pid"), scaledVec(col(vecCol)).as("__bv"))
      .withColumn("bn2", norm2Scaled(col("__bv")))
    val verdicts = cand
      .join(broadcast(b), Seq("pid"))
      .join(c, Seq("cid"))
      .withColumn("cos_e9",
        floor(dotScaled(col("__cv"), col("__bv")) /
          (sqrt(col("cn2")) * sqrt(col("bn2"))) * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("cid").as("id"))
      .agg(
        max(col("cos_e9")).as("max_cos_e9"),
        count(when(col("cos_e9") >= thresholdE9, 1)).as("n_hits"))
    corpus.select(col(idCol).as("id"))
      .join(verdicts, Seq("id"), "left")
      .select(col("id"), col("max_cos_e9"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) === 0L).as("kept"))
  }

  /** All-pairs cosine ≥ threshold — O(n²) compare AND a broadcast of
    * the whole frame: the exact reference for specs and genuinely small
    * frames ONLY. The production path is [[cosinePairs]]. */
  def cosinePairsExact(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("va"), scaledVec(col(vecCol)).as("__av"))
      .withColumn("na2", norm2Scaled(col("__av")))
    val b = df.select(col(idCol).as("vb"), scaledVec(col(vecCol)).as("__bv"))
      .withColumn("nb2", norm2Scaled(col("__bv")))
    a.join(broadcast(b), col("va") < col("vb"))
      .withColumn("cos",
        dotScaled(col("__av"), col("__bv")) / (sqrt(col("na2")) * sqrt(col("nb2"))))
      .filter(col("cos") >= threshold)
      .select(col("va"), col("vb"), col("cos"))
  }

  /** Exact per-group mean embedding as (group, i, mean_e) rows — the
    * centroid computation IVF training and label-profile analyses need.
    * Scaled-long summed per dimension, so centroids are bit-identical at
    * any parallelism; one shuffle on (group, i), map-side combined. Row
    * form (not array) keeps the shuffle rows tiny and lets callers pivot
    * or re-assemble as needed. */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), posexplode(scaledVec(col(vecCol))).as(Seq("i", "e")))
      .groupBy(col("grp"), col("i"))
      .agg((sum(col("e")).cast(DoubleType) / lit(Scale) / count(col("e"))).as("mean_e"))

  /** Uniform vector length of `vecCol`, from the first row; explicit
    * error on an empty frame (head() would throw NoSuchElementException). */
  def inferDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).limit(1).collect().headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        s"cannot infer vector dim of '$vecCol' from an empty DataFrame; pass dim explicitly"))

  /** Deterministic ±1 hyperplane component for (table, plane, dim):
    * parity of the first md5 hex digit of "t:p:i". Computed driver-side
    * — the matrix is tables×planes×dims literals, schema-sized. */
  private def signComponent(t: Int, p: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$t:$p:$i".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) % 2 == 1) 1.0 else -1.0
  }

  /** Random-hyperplane LSH buckets, AND-OR construction: `numTables`
    * independent hash tables of `numPlanes` sign bits each. Output one
    * row per (id, table) with the table-local bucket.
    *
    * Shuffle-free: the hyperplanes are a literal ±1 matrix baked into
    * the plan, and ALL tables' projections run in one native
    * expression per row ([[HyperplaneTables]] — sequential double
    * folds, deterministic and replayable by any engine's left-to-right
    * list fold) whose struct array the explode consumes. The
    * compositional per-(table, plane) fold spelling ran its lambdas
    * interpreted, numTables × numPlanes frames per vector. Rows
    * sharing a (table, bucket) are candidate neighbours; more tables
    * trade compute for recall. */
  def hyperplaneBuckets(df: DataFrame, idCol: String, vecCol: String,
                        numPlanes: Int, numTables: Int,
                        dim: Option[Int] = None): DataFrame = {
    HyperplaneTables.register(df.sparkSession)
    // vectors must share one length; pass `dim` to skip the probe job
    val d = dim.getOrElse(inferDim(df, vecCol))
    val flat = (0 until numTables).flatMap(t => (0 until numPlanes).flatMap(p =>
      (0 until d).map(i => signComponent(t, p, i))))
    df.select(col(idCol).as("id"),
        explode(call_function("hyperplane_tables", col(vecCol),
          typedlit(flat), lit(numPlanes), lit(numTables))).as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
  }

  /** LSH-bucketed ANN: top-k among candidates that share a bucket with
    * the query in ANY table. Same schema as [[bruteForceTopK]]; recall
    * < 1 by construction (measured in tests against the brute-force
    * baseline). Candidate (qid, nid) pairs join back to the scaled
    * corpus vectors on nid — a plain hash join that scales with the
    * candidate count, never |corpus|·|queries|. */
  /** Query-side multi-probe bucket set: base bucket per table plus the
    * `nProbes` single-bit perturbations nearest the hyperplane boundary
    * (see [[HyperplaneProbes]]). Same sign matrix and fold as
    * [[hyperplaneBuckets]], so corpus buckets need no re-derivation. */
  def multiProbeBuckets(df: DataFrame, idCol: String, vecCol: String,
                        numPlanes: Int, numTables: Int, nProbes: Int,
                        dim: Option[Int] = None): DataFrame = {
    HyperplaneProbes.register(df.sparkSession)
    val d = dim.getOrElse(inferDim(df, vecCol))
    val flat = (0 until numTables).flatMap(t => (0 until numPlanes).flatMap(p =>
      (0 until d).map(i => signComponent(t, p, i))))
    df.select(col(idCol).as("id"),
        explode(call_function("hyperplane_probes", col(vecCol),
          typedlit(flat), lit(numPlanes), lit(numTables), lit(nProbes))).as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
  }

  /** Multi-probe LSH ANN (Lu et al., VLDB'07): the corpus is bucketed
    * ONCE per table; each query additionally probes its `nProbes`
    * nearest-miss buckets per table. At 100 TB this is the recall knob
    * that does NOT re-materialize the corpus index: extra tables cost a
    * full corpus copy each, extra probes only add broadcast-side rows
    * to the same bucket-equi-join. Deterministic end-to-end (md5 signs,
    * sequential double fold, scaled-long cosines) — the oracle replays
    * buckets, probe ranking, candidates and scores bit-for-bit. */
  def multiProbeTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, numPlanes: Int,
                     numTables: Int = 4, nProbes: Int = 2): DataFrame = {
    val dim = Some(inferDim(corpus, vecCol)) // one probe job for both sides
    val cb = hyperplaneBuckets(corpus, idCol, vecCol, numPlanes, numTables, dim)
      .withColumnRenamed("id", "nid")
    val qb = multiProbeBuckets(queries, idCol, vecCol, numPlanes, numTables, nProbes, dim)
      .withColumnRenamed("id", "qid")
    val cand = cb.join(broadcast(qb), Seq("t", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid")).distinct()
    val c = corpus.select(col(idCol).as("nid"), scaledVec(col(vecCol)).as("__cv"))
      .withColumn("nn2", norm2Scaled(col("__cv")))
    val q = queries.select(col(idCol).as("qid"), scaledVec(col(vecCol)).as("__qv"))
      .withColumn("qn2", norm2Scaled(col("__qv")))
    val scored = cand
      .join(c, Seq("nid"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("dot", dotScaled(col("__qv"), col("__cv")))
      .withColumn("cos", col("dot") / (sqrt(col("qn2")) * sqrt(col("nn2"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int, numTables: Int = 4): DataFrame = {
    val dim = Some(inferDim(corpus, vecCol)) // one probe job for both sides
    val cb = hyperplaneBuckets(corpus, idCol, vecCol, numPlanes, numTables, dim)
      .withColumnRenamed("id", "nid")
    val qb = hyperplaneBuckets(queries, idCol, vecCol, numPlanes, numTables, dim)
      .withColumnRenamed("id", "qid")
    val cand = cb.join(broadcast(qb), Seq("t", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid")).distinct()
    val c = corpus.select(col(idCol).as("nid"), scaledVec(col(vecCol)).as("__cv"))
      .withColumn("nn2", norm2Scaled(col("__cv")))
    val q = queries.select(col(idCol).as("qid"), scaledVec(col(vecCol)).as("__qv"))
      .withColumn("qn2", norm2Scaled(col("__qv")))
    val scored = cand
      .join(c, Seq("nid"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("dot", dotScaled(col("__qv"), col("__cv")))
      .withColumn("cos", col("dot") / (sqrt(col("qn2")) * sqrt(col("nn2"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }
}
