package graft

import graft.similarity.Pca
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class VecRec(vec_id: Long, embedding: Array[Float])

/** Streaming maintenance of the PCA second moment: because
  * [[Pca.pairProducts]] reduces each row to (k, p) pair products and
  * the moment is their sum, a streaming `groupBy(k).sum(p)` in
  * complete mode maintains the EXACT batch triangle across
  * micro-batches — same int64 arithmetic, so the parity is
  * bit-for-bit, the StreamBloom/q156 convention applied to linear
  * algebra state. */
class StreamMomentSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched moment equals the batch secondMoment bit-for-bit") {
    implicit val sql = spark.sqlContext
    val dim = 4
    val rows = (0 until 40).map { k =>
      VecRec(k.toLong, Array.tabulate(dim)(i => ((k * 7 + i * 3) % 11 - 5) / 4.0f))
    }
    val input = MemoryStream[VecRec]
    val q = Pca.pairProducts(input.toDF(), "embedding", dim)
      .groupBy(col("k")).agg(sum(col("p")).as("p"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("moment_stream").start()
    try {
      input.addData(rows.take(15))
      q.processAllAvailable()
      input.addData(rows.slice(15, 27))
      q.processAllAvailable()
      input.addData(rows.drop(27))
      q.processAllAvailable()
      val streamed = spark.table("moment_stream")
        .select((col("k") / dim).cast("int").as("i"),
          (col("k") % dim).cast("int").as("j"), col("p").as("g"))
        .orderBy("i", "j").as[(Int, Int, Long)].collect().toSeq
      val batch = Pca.secondMoment(rows.toDF(), "embedding", dim)
        .orderBy("i", "j").as[(Int, Int, Long)].collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("updateMoment equals full recompute after an add/remove batch") {
    val dim = 3
    def vecs(ids: Seq[Int]) = ids.map { k =>
      VecRec(k.toLong, Array.tabulate(dim)(i => ((k * 5 + i) % 9 - 4) / 3.0f))
    }.toDF("vec_id", "embedding")
    val old = vecs(0 until 30)
    val added = vecs(100 until 110)
    val removed = vecs(0 until 7) // a subset of old
    val updated = Pca.updateMoment(
        Pca.secondMoment(old, "embedding", dim), added, removed, "embedding", dim)
      .orderBy("i", "j").as[(Int, Int, Long)].collect().toSeq
    val full = Pca.secondMoment(vecs((7 until 30) ++ (100 until 110)), "embedding", dim)
      .orderBy("i", "j").as[(Int, Int, Long)].collect().toSeq
    assert(updated == full)
  }
}
