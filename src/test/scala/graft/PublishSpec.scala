package graft

import graft.core.ArtifactStore

/** Atomic multi-artifact snapshots: readers never see a torn publish,
  * every artifact in a snapshot resolves to the same run's version,
  * and later snapshots supersede without disturbing history. */
class PublishSpec extends SparkSpec {
  import spark.implicits._

  test("all-or-nothing: a torn publish (no manifest) is invisible") {
    val root = java.nio.file.Files.createTempDirectory("graft-pub").toString
    val store = new ArtifactStore(spark, root)
    // torn: artifacts land but the manifest never commits
    store.write(Seq((1, "a")).toDF("k", "v"), "frame", "v1")
    store.write(Seq((1, true)).toDF("k", "flag"), "flags", "v1")
    assert(store.snapshots().isEmpty)
    intercept[RuntimeException](store.readSnapshot("frame"))
    // a committed publish becomes visible atomically
    store.publish(Map(
      "frame" -> Seq((2, "b")).toDF("k", "v"),
      "flags" -> Seq((2, false)).toDF("k", "flag")), "v2")
    assert(store.snapshots() == Seq("v2"))
    assert(store.readSnapshot("frame").as[(Int, String)].collect().toSeq == Seq((2, "b")))
    assert(store.readSnapshot("flags").as[(Int, Boolean)].collect().toSeq == Seq((2, false)))
  }

  test("snapshot reads are version-consistent; later snapshots supersede") {
    val root = java.nio.file.Files.createTempDirectory("graft-pub2").toString
    val store = new ArtifactStore(spark, root)
    store.publish(Map(
      "frame" -> Seq((1, "run1")).toDF("k", "v"),
      "flags" -> Seq((1, "f1")).toDF("k", "f")), "v1")
    store.publish(Map(
      "frame" -> Seq((2, "run2")).toDF("k", "v"),
      "flags" -> Seq((2, "f2")).toDF("k", "f")), "v2")
    // latest resolves BOTH artifacts to run 2
    assert(store.readSnapshot("frame").as[(Int, String)].head() == ((2, "run2")))
    assert(store.readSnapshot("flags").as[(Int, String)].head() == ((2, "f2")))
    // pinned snapshot reads reproduce run 1 exactly
    assert(store.readSnapshot("frame", Some("v1")).as[(Int, String)].head() == ((1, "run1")))
    assert(store.readSnapshot("flags", Some("v1")).as[(Int, String)].head() == ((1, "f1")))
    // an artifact missing from the snapshot fails loudly
    intercept[RuntimeException](store.readSnapshot("nope"))
  }
}
