package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{Encoders => SqlEncoders}

/** Perceptual-hash (dHash) near-duplicate detection for image
  * payloads — the multimodal arm of the near-dup family: a 64-bit
  * difference hash over an 8×9 grayscale grid (bit (r,c) set iff
  * gray(r,c+1) > gray(r,c)), banded into 4 × 16-bit keys so candidate
  * pairs come from band collisions (pigeonhole-EXACT for Hamming ≤ 3:
  * two hashes within 3 bit flips must agree on at least one untouched
  * band), then exact `bit_count(xor)` verification on candidates only
  * — never all-pairs, the same AND-OR discipline as MinHash/SimHash.
  *
  * The grayscale DECODE is the stubbed seam shared with
  * [[Multimodal]]: [[grayStream]] derives the 72 grid bytes from an
  * md5 keystream of the payload's UPPERCASE-hex rendering, so the
  * whole pipeline — grid, bits, bands, Hamming — replays in ANSI SQL
  * (`md5(upper(hex(payload)) || ':' || block)`) and a codec-backed
  * grayscale resize drops in without touching the plan. With the fake
  * decode only byte-identical payloads hash close (any byte change
  * rescrambles the stream); the REAL near-dup value (crops,
  * re-encodes) arrives with a real decoder — exactly the honesty
  * contract of the other multimodal stubs. */
object ImageHash {

  /** 72 deterministic grid bytes from 5 chained md5 blocks of the
    * payload's hex rendering (the SQL-replayable stub decode). */
  def grayStream(bytes: Array[Byte]): Array[Int] = {
    val hex = bytes.map("%02X".format(_)).mkString
    (0 until 5).flatMap { b =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$hex:$b".getBytes("UTF-8"))
        .map(_ & 0xff)
    }.take(72).toArray
  }

  /** REAL decode arm of the seam: `javax.imageio` (JDK-native, no new
    * dependency) decodes an encoded payload (PNG/JPEG/BMP/GIF/…) and
    * pools it to the 8×9 dHash grid by EXACT area-average — each grid
    * cell is the integer mean of the BT.601 luma (299·R+587·G+114·B
    * div 1000) over its pixel block, with block edges at
    * `⌊k·dim/cells⌋`. No Java2D rescaling/rendering hints, so the grid
    * is bit-deterministic across platforms and the same payload always
    * hashes identically. Returns None for undecodable payloads (no
    * registered reader, truncated stream) — callers map that to a
    * null hash, the same contract as a null payload.
    *
    * This is the drop-in the stub's Scaladoc promised: with it, crops,
    * brightness shifts and lossy re-encodes land within small Hamming
    * distance (ImageIoDecodeSpec pins those properties on real PNG/JPEG
    * fixtures), while the md5-keystream stub remains the SQL-replayable
    * arm the DuckDB oracle gates. */
  def grayGridImageIo(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes == null) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 9 || img.getHeight < 8) None
      else {
        val (iw, ih) = (img.getWidth, img.getHeight)
        val g = new Array[Int](72)
        var r = 0
        while (r < 8) {
          val y0 = r * ih / 8
          val y1 = (r + 1) * ih / 8
          var c = 0
          while (c < 9) {
            val x0 = c * iw / 9
            val x1 = (c + 1) * iw / 9
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
                  (rgb & 0xff) * 114) / 1000
                x += 1
              }
              y += 1
            }
            g(r * 9 + c) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
            c += 1
          }
          r += 1
        }
        Some(g)
      }
    } catch { case _: Exception => None }
  }

  /** dHash over a 72-byte grid: bit r*8+c set iff grid(r,c+1) > grid(r,c). */
  def dhashOfGrid(g: Array[Int]): Long = {
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val i = r * 9 + c
        if (g(i + 1) > g(i)) h |= (1L << (r * 8 + c))
        c += 1
      }
      r += 1
    }
    h
  }

  /** 64-bit dHash of the STUB decode (SQL-replayable md5 keystream). */
  def dhash64(bytes: Array[Byte]): Long = dhashOfGrid(grayStream(bytes))

  /** 64-bit dHash of a REAL encoded image via [[grayGridImageIo]];
    * None when the payload doesn't decode. */
  def dhash64ImageIo(bytes: Array[Byte]): Option[Long] =
    grayGridImageIo(bytes).map(dhashOfGrid)

  /** Append the payload's dHash as `outCol` — one batched
    * per-partition pass (the [[Multimodal.withMeta]] shape).
    * `decoder = Decoder.ImageIo` swaps the SQL-replayable stub for the
    * real [[grayGridImageIo]] codec; undecodable payloads hash null,
    * so the downstream band/verify plan is decoder-agnostic. */
  def withDhash(df: DataFrame, payloadCol: String, outCol: String,
                decoder: Decoder = Decoder.Stub): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, LongType, nullable = true))
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val h: Any =
          if (bytes == null) null
          else decoder match {
            case Decoder.Stub => dhash64(bytes)
            case Decoder.ImageIo => dhash64ImageIo(bytes).orNull
          }
        Row.fromSeq(r.toSeq :+ h)
      }
    }(SqlEncoders.row(outSchema))
  }

  /** Decode arm selector for [[withDhash]]. */
  sealed trait Decoder
  object Decoder {
    /** md5-keystream fake (deterministic, DuckDB-replayable). */
    case object Stub extends Decoder
    /** javax.imageio real codec (spec-gated; not SQL-expressible). */
    case object ImageIo extends Decoder
  }

  /** (id, hash, band, bkey) rows — the landed-index grain: 4 rows per
    * payload, bucketed/bucket-joinable on (band, bkey). */
  def bandIndex(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    withDhash(df, payloadCol, "__h")
      .select(col(idCol).as("__id"), col("__h"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("__h"), 16 * b).bitwiseAND(lit(65535L)).as("bkey"))): _*))
          .as("bb"))
      .select(col("__id"), col("__h"), col("bb.band"), col("bb.bkey"))

  /** Near-dup pairs with Hamming distance ≤ `maxHamming` (≤ 3 for
    * exactness under 4 bands; larger values trade recall): band-
    * collision candidates, exact bit_count(xor) verify, `(a < b)`
    * canonical orientation. Output: (a, b, hamming). */
  def nearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                   maxHamming: Int = 3): DataFrame = {
    // one decode pass for both join sides
    val bands = bandIndex(df, idCol, payloadCol).localCheckpoint(eager = true)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a"), col("y.__id").as("b"),
        bit_count(col("x.__h").bitwiseXOR(col("y.__h"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Incremental arm — the q88/q142/q151 landed-index discipline on
    * the image key: the BATCH probes the landed [[bandIndex]] for band
    * collisions (batch → `a`, landed → `b`) plus its own internal
    * collisions (`a < b`); landed-internal pairs are NEVER re-reported
    * (process-once), and work tracks the batch, not the corpus — at
    * scale the landed index lives bucketed by (band, bkey) so the
    * probe is a bucket-pruned join. Output: (a, b, hamming, vs_corpus). */
  def incrementalNearDups(batch: DataFrame, landedIndex: DataFrame,
                          idCol: String, payloadCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val bb = bandIndex(batch, idCol, payloadCol).localCheckpoint(eager = true)
    val probe = bb.as("x").join(landedIndex.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.__id") =!= col("y.__id"))
      .select(col("x.__id").as("a"), col("y.__id").as("b"),
        bit_count(col("x.__h").bitwiseXOR(col("y.__h"))).as("hamming"),
        lit(true).as("vs_corpus"))
    val internal = bb.as("x").join(bb.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a"), col("y.__id").as("b"),
        bit_count(col("x.__h").bitwiseXOR(col("y.__h"))).as("hamming"),
        lit(false).as("vs_corpus"))
    probe.unionByName(internal)
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
