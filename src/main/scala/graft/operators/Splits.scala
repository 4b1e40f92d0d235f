package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and shard layout for training-data
  * pipelines (builder mandate): assign every document a stable
  * train/validation/test split and, within a split, a (shard, position)
  * slot a downstream trainer can read as fixed-size files in a
  * reproducible order.
  *
  * Both assignments are md5-derived from the document id alone (the
  * pipeline's ST8 seeded-determinism policy, same draw machinery as
  * [[Sampling.hashUnit]]): membership and order never depend on
  * partitioning, row order, or an engine RNG, so reruns — and any ANSI
  * engine replaying the same formula — produce byte-identical layouts,
  * and growing the corpus never reassigns an existing document's split.
  *
  * Scale shapes: [[assignSplit]] is a pure per-row projection (no
  * shuffle). [[shardLayout]] deliberately does NOT compute a global
  * training order — a global `row_number` is a single-task sort at any
  * scale worth having. Documents hash into `nShards` shards and only
  * the WITHIN-shard position is a (per-shard, parallel) rank; trainers
  * read shards in shard-id order and rows in position order, which is
  * exactly as reproducible as a global order and needs one bounded
  * window per shard instead of a total sort.
  */
object Splits {

  /** Cumulative draw thresholds for a named split spec; fractions must
    * be positive and sum to 1 (±1e-9). Returned as (name, upperBound)
    * with the last bound forced to exactly 1.0 so the final branch
    * catches every draw. Public so an oracle can embed the EXACT same
    * double literals (0.8 + 0.1 is not the double 0.9 — a replaying
    * engine must compare against the accumulated value, not the
    * nominal one). */
  def cumThresholds(splits: Seq[(String, Double)]): Seq[(String, Double)] = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0), s"split fractions must be positive: $splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split fractions must sum to 1, got $total")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    splits.map(_._1).zip(cum.init :+ 1.0)
  }

  /** Add a `split` column: the draw `hashUnit(id, salt)` lands in the
    * half-open cumulative-fraction interval of its split, e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)` keeps draws
    * below 0.8 in train. The thresholds are computed once on the
    * driver and compared as double literals, so any engine replaying
    * the same md5 draw reproduces membership exactly. */
  def assignSplit(df: DataFrame, idCol: Column,
                  splits: Seq[(String, Double)],
                  salt: String = "split"): DataFrame =
    df.withColumn("split", splitExpr(idCol, splits, salt))

  /** The split-membership COLUMN itself — id-pure, so consumers that
    * already hold an id (e.g. a pair list) can label rows inline in
    * codegen instead of joining back to an assigned frame. */
  def splitExpr(idCol: Column, splits: Seq[(String, Double)],
                salt: String = "split"): Column = {
    val th = cumThresholds(splits)
    val draw = Sampling.hashUnit(idCol, salt)
    th.init.foldLeft(when(lit(false), lit(""))) {
      case (acc, (name, ub)) => acc.when(draw < lit(ub), lit(name))
    }.otherwise(lit(th.last._1))
  }

  /** Add `(shard, pos)` within each group of `partitionCols` (typically
    * the `split` column, or empty for one global shard space):
    * `shard = floor(draw · nShards)` (exact while nShards < 2²⁵ — the
    * 28-bit draw numerator times nShards stays under 2⁵³) and `pos` is
    * the rank of `(draw, id)` inside the shard. One window per
    * (group, shard) — `nShards` sized for shard row counts that fit a
    * task, the same contract as [[graft.text.Packing]] shards. */
  def shardLayout(df: DataFrame, idCol: Column, nShards: Int,
                  partitionCols: Seq[String] = Seq("split"),
                  salt: String = "shard"): DataFrame = {
    require(nShards > 0 && nShards < (1 << 25),
      s"nShards must be in [1, 2^25), got $nShards")
    val draw = Sampling.hashUnit(idCol, salt)
    val w = Window
      .partitionBy((partitionCols.map(col) :+ col("shard")): _*)
      .orderBy(col("__draw"), idCol)
    df.withColumn("__draw", draw)
      .withColumn("shard", floor(col("__draw") * lit(nShards)).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop("__draw")
  }

  /** Rendezvous (highest-random-weight) shard assignment: the winning
    * shard is argmax over s ∈ [0, nShards) of md5("<s>:<id>"). Unlike
    * `hash(id) mod n`, growing n → n+1 moves ONLY the documents the
    * NEW shard wins (1/(n+1) of each shard in expectation) and never
    * reassigns a document between surviving shards — the property an
    * incremental corpus needs so a shard count change doesn't
    * invalidate every landed shard file (q166 gates the census).
    *
    * A pure per-row array fold (transform + array_max over an
    * nShards-element literal sequence — no explode, no shuffle);
    * struct comparison orders by the hash first, and 128-bit md5 ties
    * are not a practical concern. Engine-portable by the same ST8
    * argument as every other md5 draw. Intended for nShards in the
    * hundreds — the per-row cost is nShards md5 calls; for thousands
    * of shards use [[shardLayout]]'s draw-interval form instead. */
  def rendezvousShard(idCol: Column, nShards: Int): Column = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    array_max(transform(sequence(lit(0), lit(nShards - 1)), s =>
      struct(md5(concat(s.cast("string"), lit(":"), idCol.cast("string"))).as("h"),
        s.cast("long").as("s"))))
      .getField("s")
  }
}
