package graft

import graft.functions.LcsLen
import org.apache.spark.sql.functions._

class LcsLenSpec extends SparkSpec {
  import spark.implicits._

  LcsLen.register(spark)

  /** Independent reference: plain memoized recursion (shares no code
    * or iteration shape with the engine's two-row DP). */
  private def lcsRef(a: Seq[String], b: Seq[String]): Int = {
    val memo = scala.collection.mutable.Map.empty[(Int, Int), Int]
    def go(i: Int, j: Int): Int =
      if (i == 0 || j == 0) 0
      else memo.getOrElseUpdate((i, j),
        if (a(i - 1) == b(j - 1)) go(i - 1, j - 1) + 1
        else math.max(go(i - 1, j), go(i, j - 1)))
    go(a.length, b.length)
  }

  private def lcsDf(a: Seq[String], b: Seq[String]): Option[Int] =
    Seq((a, b)).toDF("a", "b")
      .select(call_function("lcs_len", $"a", $"b"))
      .as[Option[Int]].head()

  test("hand cases: subsequence credit without contiguity") {
    assert(lcsDf(Seq("the", "cat", "sat", "on", "the", "mat"),
      Seq("the", "dog", "sat", "near", "the", "mat")) == Some(4)) // the sat the mat
    assert(lcsDf(Seq("a", "b", "c"), Seq("c", "b", "a")) == Some(1))
    assert(lcsDf(Seq("x", "x"), Seq("x", "x", "x")) == Some(2))
    assert(lcsDf(Seq.empty, Seq("a")) == Some(0))
    assert(lcsDf(Seq("a"), Seq.empty) == Some(0))
  }

  test("null arrays evaluate to null; asymmetric lengths use the short side for memory") {
    val out = Seq((Option(Seq("a")), Option.empty[Seq[String]]))
      .toDF("a", "b")
      .select(call_function("lcs_len", $"a", $"b"))
      .as[Option[Int]].head()
    assert(out.isEmpty)
    // long×short and short×long agree (the operand swap path)
    val long = (1 to 200).map(i => s"t${i % 7}")
    val short = Seq("t1", "t3", "t5")
    assert(lcsDf(long, short) == lcsDf(short, long))
    assert(lcsDf(long, short) == Some(lcsRef(long, short)))
  }

  test("parity with the independent recursion on real corpus token pairs") {
    val docs = graft.core.Tables.documents(spark, sf)
      .withColumn("toks", slice(
        call_function("regexp_extract_all", $"text", lit("[a-z]+"), lit(0)), 1, 32))
      .limit(40)
      .select($"doc_id", $"toks").as[(Long, Seq[String])].collect()
    val pairs = docs.sliding(2).collect { case Array((i1, a), (i2, b)) => (i1, a, i2, b) }.toSeq
    val got = Seq(pairs: _*).map { case (i1, a, i2, b) => ((i1, i2), (a, b)) }
      .map { case (k, (a, b)) => k -> ((a, b)) }
    got.foreach { case ((i1, i2), (a, b)) =>
      val eng = lcsDf(a, b).get
      val ref = lcsRef(a, b)
      assert(eng == ref, s"pair ($i1,$i2): engine $eng != reference $ref")
    }
  }

  test("identical sequences score their full length (the self-pair bound)") {
    val t = (1 to 32).map(i => s"w$i")
    assert(lcsDf(t, t) == Some(32))
  }
}
