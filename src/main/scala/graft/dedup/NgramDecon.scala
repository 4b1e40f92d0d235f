package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram collision decontamination (builder mandate: the
  * training-data pipeline counterpart of [[Dedup.decontaminate]]'s
  * near-dup form): a training document is contaminated when it shares
  * at least `minCollisions` distinct k-shingles with the protected
  * (benchmark) corpus — the "any 13-gram collision" discipline of the
  * GPT-3/PaLM eval-decontamination appendices, which catches verbatim
  * leakage that a Jaccard threshold can dilute away inside a long
  * document.
  *
  * Scale shape: the protected side reduces to DISTINCT shingles
  * (bounded — benchmark suites are millions of shingles, not
  * billions), and the corpus-side shingle stream meets it in a
  * semi-join keyed on the shingle. The optional Bloom prefilter
  * ([[contaminatedIds]]'s `bloomFpp`) broadcasts a bits-per-element
  * sketch of the protected shingles and drops non-members MAP-SIDE,
  * before the exchange — at 100 TB the corpus shingle stream is the
  * dominant shuffle, and ~all of it misses the benchmark, so the
  * prefilter turns a corpus-sized shuffle into a hits-sized one. False
  * positives pass the bloom and die in the exact semi-join (the result
  * is exact regardless of `bloomFpp`); false negatives don't exist by
  * construction. The membership probe is a Scala UDF rather than a
  * codegen expression — deliberately: it sits in a pre-shuffle filter
  * whose cost is one hash per row against the I/O it saves, not in a
  * per-row hot loop of a wide plan.
  */
object NgramDecon {

  /** Ids of `train` documents sharing ≥ `minCollisions` distinct
    * k-shingles with `bench`. `bloomFpp = Some(p)` inserts the
    * broadcast-bloom map-side prefilter (exactness unaffected); `None`
    * goes straight to the semi-join — right when the protected set is
    * small enough that Spark broadcasts the join itself. */
  def contaminatedIds(train: DataFrame, bench: DataFrame,
                      idCol: String, textCol: String, k: Int,
                      minCollisions: Long = 1L,
                      bloomFpp: Option[Double] = None): DataFrame =
    contaminatedIdsFromIndex(train,
      Dedup.shingleIndex(bench, idCol, textCol, k),
      idCol, textCol, k, minCollisions, bloomFpp)

  /** [[contaminatedIds]] against a PERSISTED protected index — the
    * production path: the benchmark index is built once, versioned in
    * the artifact store, and every ingest run probes the reloaded
    * `(doc, shingle)` frame instead of re-shingling the benchmarks. */
  def contaminatedIdsFromIndex(train: DataFrame, benchIdx: DataFrame,
                               idCol: String, textCol: String, k: Int,
                               minCollisions: Long = 1L,
                               bloomFpp: Option[Double] = None): DataFrame = {
    require(minCollisions >= 1, s"minCollisions must be >= 1, got $minCollisions")
    val benchSh = benchIdx.select(col("shingle")).distinct()
    val trainSh = Dedup.shingleIndex(train, idCol, textCol, k)
    val probed = bloomFpp match {
      case Some(fpp) =>
        require(fpp > 0 && fpp < 1, s"bloomFpp must be in (0, 1), got $fpp")
        // One bounded job to size the filter, one to build it; both run
        // over the already-distinct protected shingles. An empty
        // protected set gets no bloom (stat.bloomFilter NPEs on zero
        // rows, and the semi-join is already vacuous).
        val n = benchSh.count()
        if (n == 0) trainSh
        else {
          val bf = benchSh.stat.bloomFilter("shingle", n, fpp)
          val bcast = train.sparkSession.sparkContext.broadcast(bf)
          val mightContain = udf((s: String) => s != null && bcast.value.mightContainString(s))
          trainSh.filter(mightContain(col("shingle")))
        }
      case None => trainSh
    }
    probed
      .join(benchSh, Seq("shingle"), "left_semi")
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("long").as("n_collisions"))
      .filter(col("n_collisions") >= minCollisions)
      .select(col("doc").as(idCol), col("n_collisions"))
  }

  /** `train` minus contaminated documents (anti-join on
    * [[contaminatedIds]]). Documents too short to shingle can't
    * collide and always survive. */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String, k: Int,
                    minCollisions: Long = 1L,
                    bloomFpp: Option[Double] = None): DataFrame =
    train.join(
      contaminatedIds(train, bench, idCol, textCol, k, minCollisions, bloomFpp)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
