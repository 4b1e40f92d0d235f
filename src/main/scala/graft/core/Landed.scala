package graft.core

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped landed-artifact registry — the in-session half of the
  * repo's landed-index discipline (the parquet half is
  * [[ArtifactStore]]): a producer query LANDS a materialized frame
  * under a caller-chosen key, and downstream queries PROBE it instead
  * of recomputing the pipeline that built it. The canonical user is
  * the thread-paths pair (q231 builds the pointer-jump walk and lands
  * it; q232 assembles SFT contexts by probing the landed paths — the
  * walk no longer runs twice per suite pass).
  *
  * Keys must embed every input the frame depends on (the data dir at
  * minimum — the bench warms at sf0.001 and measures at sf0.1, so a
  * dir-less key would serve the wrong table). Values are eagerly
  * checkpointed with fresh stats (the repo-wide iterate discipline),
  * so a probe is a scan of pinned blocks, never a replay of the
  * producer's lineage. At 100 TB the same seam is a parquet artifact
  * (ArtifactStore versioned prefix) — the registry keeps the
  * composition SHAPE identical while tests and bench run in-session.
  *
  * Block hygiene: each landing records its checkpoint RDD id, so a
  * harness that re-runs producers (the bench's warmup + two measured
  * passes re-land every family each pass) can [[evict]] stale landings
  * between passes and actually release their pinned blocks — measured
  * r10 cost of NOT doing so was 61 s of suite GC (vs 9 s in r9): 281
  * queries × replaced-but-still-pinned blocks in one JVM taxed every
  * query. `land` itself still never unpersists the entry it replaces
  * (a consumer may hold the old frame, and a local checkpoint has no
  * lineage to recompute from), matching artifact-store versioning:
  * eviction is an explicit lifecycle call, not a side effect.
  */
object Landed {

  private final case class Entry(df: DataFrame, rddId: Int)

  private val cache =
    new ConcurrentHashMap[(SparkSession, String), Entry]()

  /** Bumped on every build (land or probe-miss). A harness that wants
    * to reclaim per-query checkpoint blocks can compare epochs around a
    * query to tell "this query landed an artifact later queries will
    * probe" from "all blocks this query pinned are now garbage". */
  val epoch = new AtomicLong(0L)

  /** Land `build`'s result under `key`, replacing any prior landing —
    * the PRODUCER call: always builds, so the producer's cost stays
    * honest in the bench (it IS the index build). */
  def land(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val e = materialize(build)
    cache.put((spark, key), e)
    e.df
  }

  /** Probe the landing under `key`, building (and landing) it only if
    * absent — the CONSUMER call: composes through the artifact when
    * the producer already ran, stays self-contained when it didn't. */
  def probeOrBuild(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent((spark, key), _ => materialize(build)).df

  /** Lazy checkpoint + fresh-stats rebuild: blocks pin on the FIRST
    * action (the producer's own write — one pass computes and lands,
    * no separate materialization job), and probes scan pinned blocks
    * with default (not compounded) size estimates. The rebuild wraps
    * the checkpoint's INTERNAL row RDD directly
    * ([[org.apache.spark.sql.graft.InternalDF]]) — the public
    * `createDataFrame(ck.rdd, schema)` form achieved the same stats
    * reset but paid an InternalRow→Row→InternalRow codec per row per
    * scan, taxing the producer's own read and every probe. */
  private def materialize(df: DataFrame): Entry = {
    epoch.incrementAndGet()
    val ck = df.localCheckpoint(eager = false)
    ck.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        Entry(org.apache.spark.sql.graft.InternalDF.wrap(
          ck.sparkSession, lr.rdd, ck.schema), lr.rdd.id)
      case _ =>
        Entry(ck.sparkSession.createDataFrame(ck.rdd, ck.schema), -1)
    }
  }

  /** Checkpoint RDD ids of the session's LIVE landings — the block set
    * a harness must NOT reclaim while later queries may still probe. */
  def liveRddIds(spark: SparkSession): Set[Int] = {
    val b = Set.newBuilder[Int]
    cache.forEach { (k, e) => if (k._1 eq spark) b += e.rddId }
    b.result()
  }

  /** Drop all landings for a session AND unpersist their checkpoint
    * blocks (non-blocking). Only safe at a harness boundary where no
    * consumer will touch a previously probed frame again — a local
    * checkpoint has no lineage, so a post-evict scan of an old frame
    * fails rather than recomputes. */
  def evict(spark: SparkSession): Unit = {
    val persisted = spark.sparkContext.getPersistentRDDs
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) {
        persisted.get(e.getValue.rddId).foreach(_.unpersist(blocking = false))
        it.remove()
      }
    }
  }

  /** Test hook: drop all landings for a session (blocks left to the
    * ContextCleaner, as before). */
  def clear(spark: SparkSession): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq spark) it.remove()
  }
}
