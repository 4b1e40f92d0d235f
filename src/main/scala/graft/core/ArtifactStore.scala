package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned artifact store — the reference's load-bearing convention:
  * every stage output is named `prefix__<yyyyMMddHHmmss>_<sha7>__` and
  * read back with `version = "latest"` or an exact version
  * (`/root/reference/R/utils.R:29-51`, `R/cloud-storage.R:170-214`).
  *
  * Spark mapping (SURVEY §1.4): each artifact is a Parquet directory
  * `<root>/<prefix>/v=<ts>_<sha>/`; "latest" resolves to the
  * lexicographically greatest `v=` partition (timestamp-prefixed, so
  * lexical == chronological). Readers hit exactly one version directory
  * — no cross-version scans — and any historical run is reproducible
  * from its version string.
  */
final class ArtifactStore(spark: SparkSession, root: String) {
  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  def versionString(ts: java.time.LocalDateTime, sha: String): String =
    f"${ts.format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))}_${sha.take(7)}"

  def write(df: DataFrame, prefix: String, version: String): String = {
    val path = s"$root/$prefix/v=$version"
    df.write.mode("overwrite").parquet(path)
    path
  }

  /** Versioned write hive-partitioned by `partitionCols` (e.g. month,
    * region): readers filtering on those columns scan only the matching
    * directories — at 100 TB the partition-pruned scan IS the query
    * plan's first optimization, before any pushed filter runs.
    * Pick columns of bounded cardinality (time bins, regions); never
    * high-cardinality keys, which would shatter the table into tiny
    * files. */
  def writePartitioned(df: DataFrame, prefix: String, version: String,
                       partitionCols: Seq[String]): String = {
    val path = s"$root/$prefix/v=$version"
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    path
  }

  def versions(prefix: String): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"$root/$prefix")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v="))
      .sorted
  }

  /** Read an exact version, or the latest when `version` is None. */
  def read(prefix: String, version: Option[String] = None): DataFrame = {
    val v = version.orElse(versions(prefix).lastOption)
      .getOrElse(sys.error(s"no versions of $prefix under $root"))
    spark.read.parquet(s"$root/$prefix/v=$v")
  }

  /** Retention: drop all but the newest `keep` versions of `prefix`
    * (lexical == chronological ordering). The reference accretes
    * versions forever and relies on bucket lifecycle rules; at 100 TB
    * per version the store needs an explicit arm. Returns the deleted
    * version strings, oldest first. `keep` must be ≥ 1 — the latest
    * version is never deletable through this path. */
  def retain(prefix: String, keep: Int): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val doomed = versions(prefix).dropRight(keep)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$prefix/v=$v"), true)
    }
    doomed
  }

  // ------------------------------------------------------------------
  // Atomic multi-artifact publish (manifest snapshots)
  // ------------------------------------------------------------------

  /** Write SEVERAL artifacts and commit them as ONE atomic snapshot —
    * the Iceberg-manifest discipline the composed DAG needs when a
    * stage ships multiple outputs (validate_landings publishes the
    * validated frame AND the flags sheet; format_public_data ships
    * four grains): readers must never observe output A from run N
    * next to output B from run N−1.
    *
    * Protocol: every artifact writes under its own versioned prefix
    * first; the MANIFEST — one line per artifact, `name v` — is
    * written to a temp path and RENAMED into place last (rename is
    * the storage layer's atomic primitive). A crash before the rename
    * leaves data directories that no manifest references — invisible
    * to [[readSnapshot]], reclaimable by [[retain]]. Returns the
    * manifest path. */
  def publish(artifacts: Map[String, DataFrame], version: String): String = {
    artifacts.foreach { case (name, df) => write(df, name, version) }
    val dir = new org.apache.hadoop.fs.Path(s"$root/_manifests")
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".tmp_$version")
    val out = fs.create(tmp, true)
    try out.write(artifacts.keys.toSeq.sorted
      .map(n => s"$n $version\n").mkString.getBytes("UTF-8"))
    finally out.close()
    val fin = new org.apache.hadoop.fs.Path(dir, s"m=$version")
    if (!fs.rename(tmp, fin))
      sys.error(s"manifest commit failed for $version (already committed?)")
    fin.toString
  }

  /** Committed snapshot versions, ascending (lexical == chronological). */
  def snapshots(): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"$root/_manifests")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("m=")).map(_.stripPrefix("m=")).sorted
  }

  /** Read artifact `name` out of a committed snapshot (latest by
    * default) — every artifact resolved through the same manifest, so
    * two reads from one snapshot are always version-consistent. */
  def readSnapshot(name: String, snapshot: Option[String] = None): DataFrame = {
    val v = snapshot.orElse(snapshots().lastOption)
      .getOrElse(sys.error(s"no committed snapshots under $root"))
    val manifest = new org.apache.hadoop.fs.Path(s"$root/_manifests/m=$v")
    val in = fs.open(manifest)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val entry = lines.map(_.split(" ", 2)).collectFirst {
      case Array(n, ver) if n == name => ver
    }.getOrElse(sys.error(s"artifact '$name' not in snapshot $v"))
    read(name, Some(entry))
  }
}
