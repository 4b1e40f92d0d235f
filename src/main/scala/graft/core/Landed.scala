package graft.core

import java.util.concurrent.ConcurrentHashMap

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
  * composition SHAPE identical while tests and bench run in-session. */
object Landed {

  private val cache =
    new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Land `build`'s result under `key`, replacing any prior landing —
    * the PRODUCER call: always builds, so the producer's cost stays
    * honest in the bench (it IS the index build).
    *
    * Memory hygiene: a replaced landing's checkpoint blocks are NOT
    * explicitly unpersisted — a consumer may still hold the old frame,
    * and a local checkpoint has no lineage to recompute from, so an
    * eager unpersist could fail it. The ContextCleaner reclaims the
    * blocks once the old frame's refs are collected (the engine
    * sessions run periodic GC for exactly this class of state). */
  def land(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val df = materialize(build)
    cache.put((spark, key), df)
    df
  }

  /** Probe the landing under `key`, building (and landing) it only if
    * absent — the CONSUMER call: composes through the artifact when
    * the producer already ran, stays self-contained when it didn't. */
  def probeOrBuild(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent((spark, key), _ => materialize(build))

  /** Lazy checkpoint + fresh-stats rebuild: blocks pin on the FIRST
    * action (the producer's own write — one pass computes and lands,
    * no separate materialization job), and probes scan pinned blocks
    * with default (not compounded) size estimates. */
  private def materialize(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(eager = false)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Test hook: drop all landings for a session. */
  def clear(spark: SparkSession): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq spark) it.remove()
  }
}
