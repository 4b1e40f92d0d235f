package graft

import org.apache.spark.sql.functions._
import graft.core.ArtifactStore
import graft.dedup.{Dedup, NgramDecon, Novelty}

/** Integration: the protected-set lifecycle a production decontamination
  * run has — build the benchmark shingle index once, persist it through
  * the versioned artifact store, and probe the RELOADED artifact (not
  * the in-memory frame) from both index-consuming operators. */
class DeconStoreSpec extends SparkSpec {
  import spark.implicits._

  private def bench = Seq((10L, "q w e r t y u i o p")).toDF("doc_id", "text")
  private def benchV2 = bench.unionByName(
    Seq((11L, "a b c d e f g h i j")).toDF("doc_id", "text"))
  private def train = Seq(
    (1L, "q w e r t y n n n"), // 2 shingles collide with doc 10
    (3L, "a b c d e f g h"))  // all 4 shingles inside doc 11 (v2 only)
    .toDF("doc_id", "text")

  test("reloaded latest index gates decontamination and novelty like the in-memory build") {
    val root = java.nio.file.Files.createTempDirectory("deconstore").toString
    val store = new ArtifactStore(spark, root)
    store.write(Dedup.shingleIndex(bench, "doc_id", "text", 5),
      "protected/b", "v=20260813_aaaa")
    store.write(Dedup.shingleIndex(benchV2, "doc_id", "text", 5),
      "protected/b", "v=20260813_bbbb")
    val reloaded = store.read("protected/b") // latest = v2
    val hits = NgramDecon.contaminatedIdsFromIndex(train, reloaded,
      "doc_id", "text", 5, minCollisions = 1L, bloomFpp = Some(0.05))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 2L, 3L -> 4L))
    val novelty = Novelty.incrementalNovelty(train, reloaded, "doc_id", "text", 5)
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(novelty == Map(1L -> 3L, 3L -> 0L))
    // parity with the in-memory path
    val direct = NgramDecon.contaminatedIds(train, benchV2, "doc_id", "text", 5)
      .as[(Long, Long)].collect().toMap
    assert(direct == hits)
  }

  test("pinned older version reproduces the pre-update decision") {
    val root = java.nio.file.Files.createTempDirectory("deconstore2").toString
    val store = new ArtifactStore(spark, root)
    store.write(Dedup.shingleIndex(bench, "doc_id", "text", 5),
      "protected/b", "v=20260101_aaaa")
    store.write(Dedup.shingleIndex(benchV2, "doc_id", "text", 5),
      "protected/b", "v=20260102_bbbb")
    val doc3 = train.filter(col("doc_id") === 3)
    def novelUnder(version: Option[String]): Long =
      Novelty.incrementalNovelty(doc3, store.read("protected/b", version),
        "doc_id", "text", 5)
        .select("n_novel").as[Long].head()
    assert(novelUnder(Some("v=20260101_aaaa")) == 4L) // old set: all novel
    assert(novelUnder(None) == 0L)                    // latest: fully known
  }
}
