package graft

import org.apache.spark.sql.functions._
import graft.core.ArtifactStore
import graft.text.Bpe

/** Tokenizer artifact lifecycle: learned merges persist through the
  * versioned store and the RELOADED table encodes identically — the
  * production contract (a tokenizer is trained once and shipped; every
  * later job must reproduce its segmentation exactly). */
class BpeStoreSpec extends SparkSpec {
  import spark.implicits._

  test("merges round-trip the versioned store; reloaded model encodes identically") {
    val root = java.nio.file.Files.createTempDirectory("bpestore").toString
    val store = new ArtifactStore(spark, root)
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainMerges(wf, 4)
    store.write(Bpe.mergesTable(spark, merges), "tokenizer/v1", "v=20260813_aaaa")

    val reloaded = store.read("tokenizer/v1")
      .orderBy("rank")
      .as[(Int, String, String, Long)].collect()
      .map { case (r, l, rt, f) => Bpe.Merge(r, l, rt, f) }.toSeq
    assert(reloaded == merges)

    val docs = Seq((1L, "newest lower zq")).toDF("doc_id", "text")
    val a = Bpe.encodeStats(docs, "text", merges)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toSeq
    val b = Bpe.encodeStats(docs, "text", reloaded)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
