package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata structs, processed in batched
  * per-partition passes (the Scala analogue of `mapInPandas`: one
  * iterator pass per partition, vectorizable batch shape, no per-row
  * driver round-trips).
  *
  * The actual media decode is STUBBED — codec libraries are not
  * available in this environment — behind [[Decoder]]: `FakeDecoder`
  * produces deterministic metadata/features from the bytes' md5, so the
  * Spark-side plumbing (schema, partitioning, batch iteration, feature
  * shapes) is real and testable, and a codec-backed `Decoder` can be
  * dropped in without touching any plan.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  /** Pluggable decode stage. Implementations must be deterministic pure
    * functions of the payload bytes. */
  trait Decoder extends Serializable {
    def meta(bytes: Array[Byte]): (Int, Int, Int, String)
    /** Fixed-size feature vector (e.g. a pooled embedding). */
    def features(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB: md5-derived deterministic fake standing in for a real codec. */
  object FakeDecoder extends Decoder {
    private def digest(bytes: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
    def meta(bytes: Array[Byte]): (Int, Int, Int, String) = {
      val d = digest(bytes)
      (64 + (d(0) & 0x7f), 64 + (d(1) & 0x7f), 1 + (d(2) & 0x03), "fake")
    }
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val d = digest(bytes)
      Array.tabulate(dim)(i => ((d(i % d.length) & 0xff) - 128) / 128.0f)
    }
  }

  /** STUB variant whose digest is replayable in ANSI SQL: the payload is
    * first rendered as UPPERCASE hex (SQL `upper(hex(blob))`) and the
    * md5 is taken of that string — so an oracle without a binary md5
    * can re-derive identical metadata. Same metadata formulas as
    * [[FakeDecoder]]; also a demo that `Decoder` is a drop-in seam. */
  object HexFakeDecoder extends Decoder {
    private def digest(bytes: Array[Byte]): Array[Byte] = {
      val hex = bytes.map("%02X".format(_)).mkString
      java.security.MessageDigest.getInstance("MD5").digest(hex.getBytes("UTF-8"))
    }
    def meta(bytes: Array[Byte]): (Int, Int, Int, String) = {
      val d = digest(bytes)
      (64 + (d(0) & 0x7f), 64 + (d(1) & 0x7f), 1 + (d(2) & 0x03), "fake")
    }
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val d = digest(bytes)
      Array.tabulate(dim)(i => ((d(i % d.length) & 0xff) - 128) / 128.0f)
    }
  }

  /** Attach a metadata struct for each binary payload. Runs as one
    * per-partition pass; the schema is declared up front so downstream
    * pruning/pushdown still work. */
  def withMeta(df: DataFrame, binCol: String, as: String,
               decoder: Decoder = FakeDecoder): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(as, MediaMetaType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](binCol)
        val (w, h, c, f) =
          if (bytes == null) (0, 0, 0, null) else decoder.meta(bytes)
        Row.fromSeq(r.toSeq :+ Row(w, h, c, f,
          if (bytes == null) 0L else bytes.length.toLong))
      }
    }(enc)
  }

  /** Batched feature extraction: (idCol, features array<float>) per
    * payload. Batch shape mirrors mapInPandas — partition-local
    * iteration, constant memory per batch. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String, dim: Int,
                      decoder: Decoder = FakeDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, if (bytes == null) Array.empty[Float] else decoder.features(bytes, dim))
      })
      .toDF(idCol, "features")
  }

  /** Batched feature extraction, `mapInPandas` batch shape: payloads
    * are processed `batchSize` at a time per partition, so a
    * vectorizing decoder (SIMD image ops, a GPU model) sees whole
    * arrays, while memory stays bounded at batch × payload size
    * regardless of partition size. Semantics identical to
    * [[extractFeatures]]. */
  def extractFeaturesBatched(df: DataFrame, idCol: String, binCol: String,
                             dim: Int, batchSize: Int = 64,
                             decoder: Decoder = FakeDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        // one call-site per batch: a real decoder would process the
        // whole Array[Array[Byte]] at once
        val payloads = batch.map(_._2).toArray
        val feats = payloads.map(b =>
          if (b == null) Array.empty[Float] else decoder.features(b, dim))
        batch.iterator.zip(feats.iterator).map { case ((id, _), f) => (id, f) }
      })
      .toDF(idCol, "features")
  }

  /** Deterministic frame sampling plan for video-like payloads: every
    * `stride`-th frame index below `nFrames` — the plan (which frames to
    * decode) is relational; the decode itself is the stubbed stage. */
  def frameSampleIndexes(df: DataFrame, idCol: String, nFramesCol: String,
                         stride: Int): DataFrame =
    df.select(col(idCol), explode(
      sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(stride))).as("frame_idx"))

  /** Uniform k-frame sampling MANIFEST over the payload bytes
    * themselves: the payload is treated as `n_bytes / frameBytes`
    * fixed-size frames (the stub stand-in for container parsing), and
    * for each sample slot `j < k` the frame at `⌊j·nFrames/k⌋` is
    * sliced out and fingerprinted (md5 over its UPPERCASE hex — the
    * q71 digest convention, so an oracle without binary md5 replays
    * it). Frames repeat when `nFrames < k`, exactly like uniform
    * sampling of a short clip; zero-frame payloads emit nothing.
    *
    * One per-partition pass (the mapInPandas batch shape); output is
    * (id, frame_no, frame_idx, byte_offset, frame_sig) — the manifest
    * a real decoder would consume, with the slice fingerprint standing
    * in for the decoded frame. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   frameBytes: Int, k: Int): DataFrame = {
    require(frameBytes > 0 && k > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nf = if (bytes == null) 0 else bytes.length / frameBytes
        if (nf <= 0) Iterator.empty
        else (0 until k).iterator.map { j =>
          val idx = j * nf / k
          val off = idx * frameBytes
          val hex = bytes.slice(off, off + frameBytes).map("%02X".format(_)).mkString
          val sig = java.security.MessageDigest.getInstance("MD5")
            .digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (id, j, idx, off.toLong, sig)
        }
      }
      .toDF(idCol, "frame_no", "frame_idx", "byte_offset", "frame_sig")
  }
}
