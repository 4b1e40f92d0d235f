package graft

import org.apache.spark.sql.functions._
import graft.functions.ThreadCtx

/** thread_ctx kernel: digest parity with assembling each context
  * string and hashing it whole, on chains, trees, unicode text, and a
  * deep chain that would overflow JVM recursion. */
class ThreadCtxSpec extends SparkSpec {
  import spark.implicits._

  ThreadCtx.register(spark)

  /** Reference: assemble every node's root→node context string. */
  private def reference(turns: Seq[(Long, Option[Long], String)])
      : Map[Long, (Long, Long, String)] = {
    val byId = turns.map(t => t._1 -> t).toMap
    turns.map { case (id, _, _) =>
      def chain(i: Long): List[String] = byId(i) match {
        case (_, Some(p), text) => text :: chain(p)
        case (_, None, text) => text :: Nil
      }
      val ctx = chain(id).reverse.mkString("\n")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(ctx.getBytes("UTF-8")).map("%02x".format(_)).mkString
      id -> (chain(id).length.toLong, ctx.codePointCount(0, ctx.length).toLong, md)
    }.toMap
  }

  private def run(turns: Seq[(Long, Option[Long], String)])
      : Map[Long, (Long, Long, String)] =
    turns.toDF("node", "parent", "text")
      .agg(collect_list(struct(col("node"), col("parent"), col("text"))).as("ts"))
      .select(explode(call_function("thread_ctx", col("ts"))).as("r"))
      .select(col("r.node"), col("r.n_turns"), col("r.context_chars"),
        col("r.context_md5"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap

  test("tree thread: digests equal hashing the assembled strings") {
    val turns = Seq[(Long, Option[Long], String)](
      (1L, None, "root turn"),
      (2L, Some(1L), "first reply"),
      (3L, Some(1L), "second reply"),
      (4L, Some(2L), "nested ünïcødé ⚓ reply"),
      (5L, Some(4L), ""), // empty turn text
      (6L, Some(3L), "𝕊upplementary 𠜎 plane"))
    assert(run(turns) == reference(turns))
  }

  test("5k-deep chain: no recursion overflow, digests still exact") {
    val turns = (0 until 5000).map { i =>
      (i.toLong, if (i == 0) None else Some(i.toLong - 1), s"turn $i")
    }
    val got = run(turns)
    val want = reference(turns)
    // spot-check head, middle, tail (full reference is O(n^2) chars)
    Seq(0L, 1L, 2500L, 4999L).foreach(id => assert(got(id) == want(id), s"node $id"))
    assert(got.size == 5000)
    assert(got(4999L)._1 == 5000L)
  }

  test("duplicate turn ids in one thread fail fast") {
    val e = intercept[Exception] {
      run(Seq((1L, None, "a"), (1L, None, "b"), (2L, Some(1L), "c")))
    }
    assert(e.getMessage != null && e.getMessage.contains("duplicate"))
  }

  test("input order does not matter (children may precede parents)") {
    val turns = Seq[(Long, Option[Long], String)](
      (4L, Some(3L), "d"), (3L, Some(2L), "c"), (2L, Some(1L), "b"),
      (1L, None, "a"))
    assert(run(turns) == reference(turns))
  }
}
