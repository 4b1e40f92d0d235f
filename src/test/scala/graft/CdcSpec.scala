package graft

import graft.dedup.Cdc
import org.apache.spark.sql.functions._

/** Content-defined chunking ([[graft.dedup.Cdc]]): boundary stability
  * under upstream edits (the property fixed-size chunking lacks),
  * cross-document chunk sharing, lossless reassembly, determinism. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def toks(n: Int, tag: String = "w"): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  private def chunkTexts(docs: Seq[(Long, String)]): Map[Long, Seq[String]] =
    Cdc.chunks(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc", $"chunk", $"ctext")
      .as[(Long, Long, String)].collect().toSeq
      .groupBy(_._1).map { case (d, rows) =>
        d -> rows.sortBy(_._2).map(_._3)
      }

  test("prepending tokens re-chunks only the head: every chunk after the first survives") {
    val base = toks(200)
    val m = chunkTexts(Seq((1L, base), (2L, s"pre1 pre2 pre3 $base")))
    val (a, b) = (m(1L), m(2L))
    assert(a.length > 5, s"expected several chunks, got ${a.length}")
    assert(b.containsSlice(a.drop(1)),
      s"tail chunks must survive the edit:\nA=${a.mkString("|")}\nB=${b.mkString("|")}")
  }

  test("identical spans chunk identically across documents — shared mass is found without pairwise comparison") {
    val shared = toks(120, "s")
    val docs = Seq(
      (1L, s"${toks(40, "a")} $shared ${toks(7, "z")}"),
      (2L, s"${toks(31, "b")} $shared"),
      (3L, toks(50, "c"))).toDF("doc_id", "text")
    val census = Cdc.dedupCensus(Cdc.chunks(docs, "doc_id", "text"))
      .select($"doc", $"n_dup_chunks", $"dup_tokens")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(census(1L)._2 > 60 && census(2L)._2 > 60,
      s"both holders of the shared span must report duplicated mass: $census")
    assert(census(3L) == ((0L, 0L)), s"unique doc must report none: ${census(3L)}")
  }

  test("full-duplicate documents report every chunk duplicated") {
    val t = toks(80)
    val census = Cdc.dedupCensus(
      Cdc.chunks(Seq((1L, t), (2L, t)).toDF("doc_id", "text"), "doc_id", "text"))
      .select($"doc", $"n_chunks", $"n_dup_chunks")
      .as[(Long, Long, Long)].collect()
    assert(census.forall(r => r._2 == r._3 && r._2 > 0), census.mkString(","))
  }

  test("chunks reassemble losslessly to the token stream") {
    val text = toks(150)
    val m = chunkTexts(Seq((1L, text)))
    assert(m(1L).mkString(" ") == text)
  }

  test("chunking is identical at any partitioning") {
    val docs = (1L to 30L).map(i => (i, toks(60 + (i % 11).toInt, s"t$i")))
    def run(parts: Int): Set[(Long, Long, String)] =
      Cdc.chunks(docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text")
        .select($"doc", $"chunk", $"fp").as[(Long, Long, String)]
        .collect().toSet
    assert(run(1) == run(16))
  }
}
