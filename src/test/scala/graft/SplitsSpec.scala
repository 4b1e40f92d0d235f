package graft

import org.apache.spark.sql.functions._
import graft.operators.Splits

/** Deterministic split assignment + shard layout: membership stability,
  * fraction fidelity, rank determinism under repartitioning, and the
  * grow-only contract (adding documents never reassigns existing ones).
  */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (0 until n).map(_.toLong).toDF("id")
  private val spec = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("assignSplit: fractions land near nominal, membership is id-pure") {
    val assigned = Splits.assignSplit(docs(2000), col("id"), spec)
    val byLabel = assigned.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > 1500 && byLabel("train") < 1700, byLabel)
    assert(byLabel("val") > 130 && byLabel("val") < 270, byLabel)
    // repartitioning must not move a single document
    val a = assigned.select("id", "split").as[(Long, String)].collect().toMap
    val b = Splits.assignSplit(docs(2000).repartition(13), col("id"), spec)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("assignSplit: growing the corpus never reassigns an existing doc") {
    val small = Splits.assignSplit(docs(500), col("id"), spec)
      .select("id", "split").as[(Long, String)].collect().toMap
    val large = Splits.assignSplit(docs(2000), col("id"), spec)
      .select("id", "split").as[(Long, String)].collect().toMap
    small.foreach { case (id, s) => assert(large(id) == s, s"doc $id moved") }
  }

  test("assignSplit: rejects bad fraction specs") {
    intercept[IllegalArgumentException] {
      Splits.assignSplit(docs(10), col("id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Splits.assignSplit(docs(10), col("id"), Seq("a" -> 1.5, "b" -> -0.5))
    }
  }

  test("cumThresholds: accumulated double literals, last forced to 1.0") {
    val th = Splits.cumThresholds(spec)
    assert(th.map(_._1) == Seq("train", "val", "test"))
    assert(th.head._2 == 0.8)
    assert(th(1)._2 == 0.8 + 0.1) // the accumulated double, NOT the literal 0.9
    assert(th.last._2 == 1.0)
  }

  test("shardLayout: positions are a dense 0..n-1 rank per (split, shard), stable under repartitioning") {
    val base = Splits.assignSplit(docs(1000), col("id"), spec)
    val layout = Splits.shardLayout(base, col("id"), nShards = 4)
    val rows = layout.select("split", "shard", "pos", "id")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 1000)
    assert(rows.forall { case (_, s, _, _) => s >= 0 && s < 4 })
    // dense ranks per group
    rows.groupBy(r => (r._1, r._2)).foreach { case (g, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq, s"group $g")
    }
    // identical layout from a differently-partitioned input
    val again = Splits.shardLayout(base.repartition(17), col("id"), nShards = 4)
      .select("split", "shard", "pos", "id").as[(String, Long, Long, Long)].collect()
    assert(rows.sortBy(_._4).toSeq == again.sortBy(_._4).toSeq)
  }

  test("shardLayout: empty partition-col list gives one global shard space") {
    val layout = Splits.shardLayout(docs(100), col("id"), nShards = 2,
      partitionCols = Seq.empty)
    val byShard = layout.groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(byShard.keySet.subsetOf(Set(0L, 1L)) && byShard.values.sum == 100L)
  }

  test("splitLeakage matrix partitions the near-dup pairs; labels agree with assignSplit") {
    val corpus = graft.core.Tables.documents(spark, sf)
    val matrix = graft.dedup.Dedup
      .splitLeakage(corpus, "doc_id", "text", spec,
        k = 5, numPerms = 16, rowsPerBand = 4, threshold = 0.6)
      .select($"split_a", $"split_b", $"n_pairs")
      .as[(String, String, Long)].collect()
    // unordered classes are normalized lexically
    matrix.foreach { case (a, b, _) => assert(a <= b, s"$a > $b") }
    // the matrix partitions the pair list: class counts must agree with
    // an independent recomputation via assignSplit joins
    val pairs = graft.dedup.Dedup.minhashLshPairs(corpus, "doc_id", "text",
      k = 5, numPerms = 16, rowsPerBand = 4, threshold = 0.6)
    val assigned = Splits.assignSplit(corpus.select($"doc_id"), $"doc_id", spec)
    val expected = pairs
      .join(assigned.select($"doc_id".as("da"), $"split".as("la")), Seq("da"))
      .join(assigned.select($"doc_id".as("db"), $"split".as("lb")), Seq("db"))
      .select(least($"la", $"lb"), greatest($"la", $"lb"))
      .as[(String, String)].collect()
      .groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    assert(matrix.map { case (a, b, n) => (a, b) -> n }.toMap == expected,
      s"matrix=${matrix.toSeq} expected=$expected")
    assert(matrix.map(_._3).sum == pairs.count(), "classes must partition all pairs")
  }

  test("rendezvousShard: n -> n+1 moves docs ONLY into the new shard") {
    val docs = (0 until 2000).map(i => Tuple1(i.toLong)).toDF("doc_id")
    val assigned = docs
      .withColumn("s8", Splits.rendezvousShard($"doc_id", 8))
      .withColumn("s9", Splits.rendezvousShard($"doc_id", 9))
      .as[(Long, Long, Long)].collect()
    assigned.foreach { case (id, s8, s9) =>
      assert(s8 >= 0 && s8 < 8 && s9 >= 0 && s9 < 9)
      // the old winner stays the winner unless the NEW shard outbids it
      assert(s9 == s8 || s9 == 8, s"doc $id moved between surviving shards: $s8 -> $s9")
    }
    // the new shard wins roughly 1/9 of the corpus
    val moved = assigned.count { case (_, s8, s9) => s8 != s9 }
    assert(moved > 2000 / 9 / 2 && moved < 2000 / 9 * 2, s"moved=$moved")
  }

  test("rendezvousShard matches a direct argmax-by-md5 recomputation") {
    val ids = Seq(0L, 1L, 17L, 999L)
    val got = ids.toDF("doc_id")
      .select(Splits.rendezvousShard($"doc_id", 5).as("s"))
      .as[Long].collect().toSeq
    val want = ids.map { id =>
      (0 until 5).maxBy { s =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$s:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }.toLong
    }
    assert(got == want)
  }
}
