package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Exact

/** Bradley–Terry strength fitting from pairwise preference data — the
  * aggregation step behind RLHF reward modeling and arena-style model
  * ranking: given counts of "i beat j", estimate a strength p_i per
  * item so that P(i ≻ j) = p_i / (p_i + p_j).
  *
  * Fitting uses the classical minorization–maximization update
  * (Hunter, "MM algorithms for generalized Bradley–Terry models",
  * Annals of Statistics 2004):
  *
  *   p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j)
  *
  * with W_i = total wins of i and n_ij = games between i and j,
  * renormalized to Σp = 1 after every step. A fixed iteration count
  * (no data-dependent stopping) keeps the computation replayable.
  *
  * Distributed shape: the comparison table is the big side (one row
  * per unordered pair with game/win counts — at 100 TB this is the
  * full preference log pre-aggregated by one groupBy); the parameter
  * vector is one row per ITEM (models/policies — thousands at most)
  * and rides a broadcast join. Each iteration is therefore one
  * broadcast join + one aggregation on item id; no collect, no
  * driver-side loop over data.
  *
  * Determinism: the per-pair quotients n/(p_i+p_j) are IEEE doubles
  * (identical in any engine); their per-item sum is decimal-routed
  * ([[Exact.dsum]]) so the result is bit-identical at any parallelism
  * and replayable by an ANSI oracle using the matching
  * CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) shape.
  */
object BradleyTerry {

  /** Fit strengths over a canonical pair table.
    *
    * @param pairs  one row per unordered item pair: (aCol, bCol,
    *               winsA, winsB) with aCol < bCol conventionally —
    *               only distinctness is required
    * @param iters  fixed MM iteration count
    * @return (item, wins, games, strength) — strength normalized to
    *         sum 1 across items
    */
  def fit(pairs: DataFrame, aCol: String, bCol: String,
          winsACol: String, winsBCol: String, iters: Int): DataFrame =
    fitImpl(pairs, aCol, bCol, winsACol, winsBCol, None, iters)

  /** MM iterations WARM-STARTED from a previous strength vector — the
    * online/streaming arm (the [[graft.graph.PageRank.continueFrom]]
    * discipline): as comparisons land, re-converge from the last
    * converged strengths instead of re-iterating from uniform over
    * the accumulated log. Items unseen by `strengths0` enter at the
    * uniform mass 1/|items|; the seeded vector renormalizes to Σp = 1
    * (decimal-routed) so the loop invariant holds, then the identical
    * MM rounds run.
    *
    * @param strengths0 (item, strength) — e.g. a previous [[fit]] /
    *                   [[continueFrom]] output */
  def continueFrom(pairs: DataFrame, aCol: String, bCol: String,
                   winsACol: String, winsBCol: String,
                   strengths0: DataFrame, iters: Int): DataFrame =
    fitImpl(pairs, aCol, bCol, winsACol, winsBCol, Some(strengths0), iters)

  private def fitImpl(pairs: DataFrame, aCol: String, bCol: String,
                      winsACol: String, winsBCol: String,
                      warm: Option[DataFrame], iters: Int): DataFrame = {
    val a = col(aCol); val b = col(bCol)
    val wa = col(winsACol).cast("double"); val wb = col(winsBCol).cast("double")
    // symmetric view: one row per ORDERED (item, opponent) pair.
    // Eagerly checkpointed + rebuilt as a fresh LogicalRDD: `sym` is
    // joined in EVERY MM round, and without the pin each round would
    // re-execute the caller's upstream plan (in q203 a full fact-table
    // scan + groupBy — at 100 TB the dominant cost, paid `iters`
    // times for nothing). The fresh-stats rebuild is the same
    // discipline as the per-round iterate below.
    val symCk = pairs
      .select(a.as("item"), b.as("opp"), (wa + wb).as("n"), wa.as("w"))
      .unionByName(pairs
        .select(b.as("item"), a.as("opp"), (wa + wb).as("n"), wb.as("w")))
      .localCheckpoint(eager = true)
    val sym = symCk.sparkSession.createDataFrame(symCk.rdd, symCk.schema)
    val games = sym.groupBy(col("item")).agg(Exact.dsum(col("n")).as("games"))
    // wins ride the same checkpointed pass (same (item, w) multiset as
    // the a-side/b-side union; dsum is order-independent, so values
    // are bit-identical to the former two-scan spelling)
    val wins = sym.groupBy(col("item"))
      .agg(Exact.dsum(col("w")).as("w"))
      .localCheckpoint(eager = true) // reused every iteration
    val items = games.select(col("item"))
    val nItems = items.count() // item-cardinality only: bounded (models), not data rows
    var p = warm match {
      case None => items.withColumn("p", lit(1.0 / nItems))
      case Some(p0) =>
        val seeded = items
          .join(p0.select(col("item"), col("strength").as("__p0")),
            Seq("item"), "left")
          .select(col("item"),
            coalesce(col("__p0"), lit(1.0 / nItems)).as("p"))
        val tot = seeded.agg(Exact.dsum(col("p")).as("__t"))
        // pinned like the loop iterate: the seed feeds both broadcast
        // sides of round 1
        val ck = seeded.crossJoin(broadcast(tot))
          .select(col("item"), (col("p") / col("__t")).as("p"))
          .localCheckpoint(eager = true)
        ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
    }
    var it = 0
    while (it < iters) {
      val joined = sym
        .join(broadcast(p.withColumnRenamed("p", "p_i")), Seq("item"))
        .join(broadcast(p.select(col("item").as("opp"), col("p").as("p_j"))),
          Seq("opp"))
      val den = joined.groupBy(col("item"))
        .agg(Exact.dsum(col("n") / (col("p_i") + col("p_j"))).as("den"))
      val raw = wins
        .join(den, Seq("item"))
        .select(col("item"), (col("w") / col("den")).as("praw"))
      val tot = raw.agg(Exact.dsum(col("praw")).as("tot"))
      // EAGER per-round checkpoint + a FRESH LogicalRDD. Both halves
      // measured necessary: (a) localCheckpoint alone preserves the
      // parent plan's stats, whose join-product sizeInBytes BigInts
      // then COMPOUND geometrically with rounds (a 20-round fit spent
      // 24 min inside BigInteger multiplies in the stats visitor);
      // rebuilding from the materialized RDD resets them. (b) Each
      // iterate is consumed THREE times (both broadcast sides + the
      // next round), so deferring materialization to every other round
      // re-executes the round subtree per consumer — measured 33 %
      // SLOWER at sf0.1 despite half the barriers.
      val ck = raw.crossJoin(broadcast(tot))
        .select(col("item"), (col("praw") / col("tot")).as("p"))
        .localCheckpoint(eager = true)
      p = ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
      it += 1
    }
    wins
      .join(games, Seq("item"))
      .join(p, Seq("item"))
      .select(col("item"), col("w").as("wins"), col("games"),
        col("p").as("strength"))
  }
}
