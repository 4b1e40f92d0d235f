package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def payloads = Seq(
    (1L, "fake-image-bytes-aaaa"),
    (2L, "fake-image-bytes-bbbb"),
    (3L, null: String)
  ).toDF("id", "s").withColumn("payload", $"s".cast("binary")).drop("s")

  test("withMeta attaches a typed metadata struct per payload (null-safe)") {
    val out = Multimodal.withMeta(payloads, "payload", "meta")
    assert(out.schema("meta").dataType == Multimodal.MediaMetaType)
    val rows = out.select($"id", $"meta.width", $"meta.n_bytes").collect()
    val byId = rows.map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(byId(1L)._1 >= 64 && byId(1L)._2 == 21L)
    assert(byId(3L) == (0, 0L))
  }

  test("withMeta is deterministic (same bytes → same fake decode)") {
    val a = Multimodal.withMeta(payloads, "payload", "meta")
      .select($"id", $"meta").collect().toSet
    val b = Multimodal.withMeta(payloads, "payload", "meta")
      .select($"id", $"meta").collect().toSet
    assert(a == b)
  }

  test("extractFeatures yields fixed-dim vectors in batch-iterated partitions") {
    val out = Multimodal.extractFeatures(payloads.filter($"id" < 3), "id", "payload", dim = 8)
    val feats = out.as[(Long, Array[Float])].collect().toMap
    assert(feats(1L).length == 8 && feats(2L).length == 8)
    assert(feats(1L).toSeq != feats(2L).toSeq)
    assert(feats.values.flatten.forall(f => f >= -1.0f && f <= 1.0f))
  }

  test("frameSampleIndexes plans every stride-th frame") {
    val df = Seq((1L, 10), (2L, 1)).toDF("id", "n_frames")
    val idx = Multimodal.frameSampleIndexes(df, "id", "n_frames", stride = 4)
      .as[(Long, Int)].collect().toSet
    assert(idx == Set((1L, 0), (1L, 4), (1L, 8), (2L, 0)))
  }
  test("extractFeaturesBatched == extractFeatures (batch boundaries invisible)") {
    val many = (1L to 100L).map(i => (i, s"payload-$i")).toDF("id", "s")
      .withColumn("payload", $"s".cast("binary")).drop("s")
      .repartition(3)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    val plain = toMap(Multimodal.extractFeatures(many, "id", "payload", dim = 8))
    val batched = toMap(Multimodal.extractFeaturesBatched(
      many, "id", "payload", dim = 8, batchSize = 7))
    assert(plain == batched)
    assert(plain(1L).length == 8)
  }

  test("sampleFrames: uniform indexes, in-bounds offsets, short-clip repeats") {
    // 20-byte payload, 8-byte frames -> nf = 2; k = 4 slots repeat frames
    val bytes20 = Array.tabulate(20)(_.toByte)
    val bytes64 = Array.tabulate(64)(i => (i * 3).toByte)
    val df = Seq((1L, bytes20), (2L, bytes64), (3L, Array.empty[Byte]))
      .toDF("id", "payload")
    val got = Multimodal.sampleFrames(df, "id", "payload", frameBytes = 8, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    // id 1: nf=2, idx = j*2/4 = 0,0,1,1 ; id 2: nf=8, idx = 0,2,4,6 ; id 3: none
    assert(got == Set(
      (1L, 0, 0, 0L), (1L, 1, 0, 0L), (1L, 2, 1, 8L), (1L, 3, 1, 8L),
      (2L, 0, 0, 0L), (2L, 1, 2, 16L), (2L, 2, 4, 32L), (2L, 3, 6, 48L)))
  }

  test("sampleFrames fingerprints are slice-content hashes, stable under repartition") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 60L).map(i =>
      (i, Array.fill(8 + rnd.nextInt(90))(rnd.nextInt(256).toByte)))
    val df = rows.toDF("id", "payload")
    def sigs(parts: Int) = Multimodal.sampleFrames(
        df.repartition(parts), "id", "payload", frameBytes = 8, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(4)).toMap
    val a = sigs(1)
    assert(a == sigs(7))
    // reference fingerprint for one known slice
    val (id0, b0) = rows.head
    val nf = b0.length / 8
    val hex = b0.slice(0, 8).map("%02X".format(_)).mkString
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(nf > 0 && a((id0, 0)) == want)
  }

  test("HexFakeDecoder features recover the md5 bytes exactly (the q177 tower)") {
    val feats = Multimodal.extractFeatures(
        payloads.filter($"payload".isNotNull), "id", "payload", dim = 8,
        Multimodal.HexFakeDecoder)
      .select($"id",
        transform($"features", f => round(f * 128).cast("long")).as("iv"))
      .as[(Long, Seq[Long])].collect().toMap
    val raw = payloads.filter($"payload".isNotNull)
      .select($"id", $"payload").as[(Long, Array[Byte])].collect()
    raw.foreach { case (id, bytes) =>
      val hex = bytes.map("%02X".format(_)).mkString
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8"))
      val want = (0 until 8).map(i => ((d(i) & 0xff) - 128).toLong)
      assert(feats(id) == want, s"id $id: float tower lost byte exactness")
    }
  }
}
