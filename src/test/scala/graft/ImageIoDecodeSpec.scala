package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.multimodal.ImageHash
import org.apache.spark.sql.functions._

/** The REAL decode arm of the multimodal seam: `javax.imageio` decode
  * + exact area-average pooling behind the same dHash the stub gates.
  * Fixtures are real in-memory PNG/JPEG encodes (no files, no new
  * deps), so the spec pins the properties the stub cannot have — a
  * lossy re-encode or small crop of the SAME picture stays within a
  * small Hamming distance, a different picture lands far away. */
class ImageIoDecodeSpec extends SparkSpec {
  import spark.implicits._

  /** Textured grayscale test image (smooth enough that 8×9 area means
    * survive JPEG quantization, busy enough that dHash bits vary). */
  private def paint(w: Int, h: Int, f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private def texture(x: Int, y: Int): Int =
    (128 + 110 * math.sin(x * 0.35) * math.cos(y * 0.22)).toInt

  private val base = paint(90, 64, texture)
  private val png = encode(base, "png")

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("PNG round-trip decodes and hashes deterministically") {
    val h1 = ImageHash.dhash64ImageIo(png)
    val h2 = ImageHash.dhash64ImageIo(encode(paint(90, 64, texture), "png"))
    assert(h1.isDefined && h1 == h2)
  }

  test("lossy JPEG re-encode of the same picture stays within small Hamming") {
    val jpg = encode(base, "jpg")
    assert(jpg.length > 0 && !(jpg sameElements png))
    val (hp, hj) = (ImageHash.dhash64ImageIo(png).get,
      ImageHash.dhash64ImageIo(jpg).get)
    assert(ham(hp, hj) <= 8, s"png-vs-jpeg hamming ${ham(hp, hj)}")
  }

  test("uniform brightness shift preserves the difference hash") {
    val bright = encode(paint(90, 64, (x, y) => texture(x, y) + 15), "png")
    val d = ham(ImageHash.dhash64ImageIo(png).get,
      ImageHash.dhash64ImageIo(bright).get)
    assert(d <= 6, s"brightness hamming $d")
  }

  test("a small crop stays near; a different picture lands far") {
    val crop = encode(paint(86, 62, (x, y) => texture(x + 2, y + 1)), "png")
    val other = encode(paint(90, 64, (x, y) => 255 - texture(7 * x + 3, 5 * y + 11)), "png")
    val h0 = ImageHash.dhash64ImageIo(png).get
    val dc = ham(h0, ImageHash.dhash64ImageIo(crop).get)
    val do_ = ham(h0, ImageHash.dhash64ImageIo(other).get)
    assert(dc <= 16, s"crop hamming $dc")
    assert(do_ >= 20, s"different-image hamming $do_")
    assert(dc < do_)
  }

  test("undecodable payloads decode to None (null hash through the seam)") {
    assert(ImageHash.dhash64ImageIo("not an image".getBytes).isEmpty)
    assert(ImageHash.dhash64ImageIo(java.util.Arrays.copyOf(png, 24)).isEmpty)
    assert(ImageHash.grayGridImageIo(null).isEmpty)
  }

  test("withDhash(ImageIo) drives the real codec through the Spark seam") {
    val jpg = encode(base, "jpg")
    val df = Seq(
      (1L, png), (2L, jpg), (3L, "garbage".getBytes), (4L, null: Array[Byte])
    ).toDF("id", "payload")
    val out = ImageHash.withDhash(df, "payload", "h",
      decoder = ImageHash.Decoder.ImageIo)
    val byId = out.select($"id", $"h").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(byId(3L).isEmpty && byId(4L).isEmpty)
    assert(byId(1L).isDefined && byId(2L).isDefined)
    assert(ham(byId(1L).get, byId(2L).get) <= 8)
    // decoder default stays the stub: same frame, different arm
    val stub = ImageHash.withDhash(df.filter($"id" === 1), "payload", "h")
      .select($"h").as[Long].head()
    assert(stub == ImageHash.dhash64(png))
  }
}
