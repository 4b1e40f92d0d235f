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

  /** 64-bit dHash: bit r*8+c set iff grid(r, c+1) > grid(r, c). */
  def dhash64(bytes: Array[Byte]): Long = {
    val g = grayStream(bytes)
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

  /** Append the payload's dHash as `outCol` — one batched
    * per-partition pass (the [[Multimodal.withMeta]] shape). */
  def withDhash(df: DataFrame, payloadCol: String, outCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, LongType, nullable = true))
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val h: Any = if (bytes == null) null else dhash64(bytes)
        Row.fromSeq(r.toSeq :+ h)
      }
    }(SqlEncoders.row(outSchema))
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
