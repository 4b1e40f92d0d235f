package graft

import org.apache.spark.sql.functions._
import graft.text.Packing

/** Sequence-packing invariants for both disciplines (Packing.pack /
  * packFirstFit): token conservation, capacity bounds, oversize
  * isolation, bin density, determinism under repartitioning, and the
  * fail-fast token contract. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val capacity = 50L
  // deterministic pseudo-random fixture: tokens 1..60 (some > capacity),
  // token column as STRING to exercise the cast path
  private def docs = (0 until 200).map { i =>
    (i.toLong, ((i * 2654435761L) % 60 + 1).toString)
  }.toDF("doc_id", "n_tok")

  private def packed = Packing.packFirstFit(docs, "doc_id", "n_tok", capacity, nShards = 8)

  test("packFirstFit: rows and tokens are conserved") {
    val rows = packed.collect()
    assert(rows.length == 200)
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == (0L until 200L).toSet)
    val wantTokens = (0 until 200).map(i => (i * 2654435761L) % 60 + 1).sum
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == wantTokens)
  }

  test("packFirstFit: offset + n_tokens <= capacity except oversize; oversize at offset 0") {
    val rows = packed.collect()
    rows.foreach { r =>
      val (off, t, over) = (r.getAs[Long]("offset"), r.getAs[Long]("n_tokens"),
        r.getAs[Boolean]("oversize"))
      assert(over == (t > capacity), s"oversize flag wrong for $r")
      if (!over) assert(off + t <= capacity, s"bin overfilled: $r")
      else assert(off == 0L, s"oversize doc not at bin start: $r")
    }
  }

  test("packFirstFit: oversize docs sit alone in their bin; other bins within capacity") {
    val byBin = packed.collect()
      .groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")))
    byBin.foreach { case (key, rs) =>
      if (rs.exists(_.getAs[Boolean]("oversize")))
        assert(rs.length == 1, s"oversize doc shares bin $key")
      else
        assert(rs.map(_.getAs[Long]("n_tokens")).sum <= capacity,
          s"bin $key over capacity")
    }
  }

  test("packFirstFit: bins are dense (0..max, none skipped) per shard") {
    packed.collect().groupBy(_.getAs[Long]("shard")).foreach { case (s, rs) =>
      val bins = rs.map(_.getAs[Long]("bin")).toSet
      assert(bins == (0L to bins.max).toSet, s"shard $s has skipped bins")
    }
  }

  test("packFirstFit: assignment identical under any input partitioning") {
    def run(parts: Int) =
      Packing.packFirstFit(docs.repartition(parts), "doc_id", "n_tok", capacity, 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(run(3) == run(7))
    assert(run(1) == run(7))
  }

  test("both disciplines fail fast on null and negative token counts") {
    val bad1 = Seq((1L, Some("10")), (2L, None)).toDF("doc_id", "n_tok")
    val bad2 = Seq((1L, "10"), (2L, "-3")).toDF("doc_id", "n_tok")
    val bad3 = Seq((1L, "10"), (2L, "oops")).toDF("doc_id", "n_tok") // casts to null
    for (bad <- Seq(bad1, bad2, bad3); fn <- Seq(
      () => Packing.packFirstFit(bad, "doc_id", "n_tok", 50L, 2).collect(),
      () => Packing.pack(bad, "doc_id", "n_tok", 50L, 2).collect())) {
      val e = intercept[Exception](fn())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("Packing")), s"unexpected error: $e")
    }
  }

  test("pack: bin/offset equal the contiguous-fill prefix sums; spans_bins exact") {
    val out = Packing.pack(docs, "doc_id", "n_tok", capacity, nShards = 8).collect()
    out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val t = r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("bin") == cum / capacity, s"bin mismatch: $r")
        assert(r.getAs[Long]("offset") == cum % capacity, s"offset mismatch: $r")
        assert(r.getAs[Boolean]("spans_bins") == (cum % capacity + t > capacity))
        cum += t
      }
    }
  }

  test("chunks: segments tile each document exactly; split count matches spans_bins") {
    val packed = Packing.pack(docs, "doc_id", "n_tok", capacity, nShards = 8)
    val seg = Packing.chunks(packed, capacity).collect()
    val byDoc = seg.groupBy(_.getAs[Long]("doc_id"))
    val pk = packed.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byDoc.keySet == pk.keySet, "every doc yields at least one segment")
    byDoc.foreach { case (id, ss) =>
      val n = pk(id).getAs[Long]("n_tokens")
      // segments tile [0, n) in order with no gaps
      val sorted = ss.sortBy(_.getAs[Long]("tok_start"))
      assert(sorted.head.getAs[Long]("tok_start") == 0L)
      assert(sorted.last.getAs[Long]("tok_end") == n)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("tok_end") == b.getAs[Long]("tok_start"))
          assert(b.getAs[Long]("bin") == a.getAs[Long]("bin") + 1)
          assert(b.getAs[Long]("offset") == 0L, "continuation starts at bin start")
        case _ =>
      }
      // first segment sits at the doc's packed offset
      assert(sorted.head.getAs[Long]("offset") == pk(id).getAs[Long]("offset"))
      assert((ss.length > 1) == pk(id).getAs[Boolean]("spans_bins"))
    }
    // per (shard, bin): segments never overlap and fit the capacity
    seg.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin"))).foreach {
      case (_, ss) =>
        val ivs = ss.map(r => (r.getAs[Long]("offset"),
          r.getAs[Long]("offset") + r.getAs[Long]("tok_end") - r.getAs[Long]("tok_start")))
          .sortBy(_._1)
        assert(ivs.last._2 <= capacity)
        ivs.sliding(2).foreach {
          case Array(a, b) => assert(a._2 <= b._1, "overlapping segments in a bin")
          case _ =>
        }
    }
  }

  test("pack: bin arithmetic stays exact past 2^53 cumulative tokens") {
    // prev-cumulative 2^53+3: double division by 2 yields ...498 (the
    // sum rounds to 2^53+4 as a double); integer div yields ...497
    val big = (1L << 53) + 3
    val d = Seq((1L, big), (2L, 1L)).toDF("doc_id", "n_tok")
    val out = Packing.pack(d, "doc_id", "n_tok", capacity = 2L, nShards = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap
    assert(out(1L) == 0L)
    assert(out(2L) == big / 2L) // 4503599627370497, not the double-rounded 498
  }

  test("lengthBatches: sorted batching never pads more than arrival batching") {
    val d = (1L to 500L).map(i => (i, (i * 37) % 97 + 1)).toDF("doc_id", "n_tok")
    val census = Packing.paddingCensus(
      Packing.lengthBatches(d, "doc_id", "n_tok", batchSize = 16, nShards = 4))
    val rows = census.collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (sp, ap) = (r.getAs[Long]("sorted_padding"), r.getAs[Long]("arrival_padding"))
      assert(sp >= 0 && sp <= ap, s"sorted $sp must not exceed arrival $ap")
    }
  }

  test("lengthBatches: batches are contiguous length ranges of size batchSize") {
    val d = (1L to 100L).map(i => (i, (i * 13) % 50 + 1)).toDF("doc_id", "n_tok")
    val b = Packing.lengthBatches(d, "doc_id", "n_tok", batchSize = 8, nShards = 1)
      .select("doc_id", "n_tokens", "sorted_batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byBatch = b.groupBy(_._3).toSeq.sortBy(_._1)
    byBatch.init.foreach { case (_, g) => assert(g.length == 8) }
    // max length of batch k <= min length of batch k+1
    val ranges = byBatch.map { case (k, g) => (k, g.map(_._2).min, g.map(_._2).max) }
    ranges.sliding(2).foreach {
      case Seq((_, _, hi), (_, lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }
}
