package graft

import graft.operators.Allocation
import org.apache.spark.sql.functions._

/** Neyman allocation: budget conservation to the unit, zero-variance
  * strata excluded, variance-proportional shares, the N_h cap with
  * deterministic surplus re-grant, and partitioning invariance. */
class AllocationSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (String, Double)*) = rows.toDF("stratum", "x")

  test("allocations sum to the budget exactly; zero-variance stratum gets 0") {
    val df = frame(
      (Seq.tabulate(50)(i => ("a", i.toDouble)) ++
        Seq.tabulate(50)(i => ("b", i * 10.0)) ++
        Seq.tabulate(40)(_ => ("const", 7.0))): _*)
    val out = Allocation.neyman(df, "stratum", "x", budget = 37L)
      .select($"stratum", $"alloc", $"weight")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.values.map(_._2).sum == 37L)
    assert(out("const")._2 == 0L && out("const")._3 == 0.0)
    // b has 10x the sd of a at equal size: super-proportional share
    assert(out("b")._2 > out("a")._2 * 5)
  }

  test("cap at N_h with surplus re-granted deterministically") {
    // 'tiny' would deserve nearly the whole budget by variance but has
    // only 3 rows; the surplus must flow to the others, still summing
    // to the budget
    val df = frame(
      (Seq(("tiny", 0.0), ("tiny", 1e6), ("tiny", -1e6)) ++
        Seq.tabulate(100)(i => ("u", i.toDouble)) ++
        Seq.tabulate(100)(i => ("v", i * 2.0))): _*)
    val out = Allocation.neyman(df, "stratum", "x", budget = 50L)
      .select($"stratum", $"n_rows", $"alloc")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("tiny")._3 == 3L, "capped at its population")
    assert(out.values.map(_._3).sum == 50L, "surplus re-granted, budget conserved")
    out.values.foreach { case (_, n, a) => assert(a <= n) }
  }

  test("partitioning-invariant") {
    val df = frame(Seq.tabulate(300)(i => ("s" + i % 6, (i * i % 97).toDouble)): _*)
    def run(d: org.apache.spark.sql.DataFrame) =
      Allocation.neyman(d, "stratum", "x", budget = 101L)
        .select($"stratum", $"alloc").as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(run(df) == run(df.repartition(13)))
    assert(run(df).map(_._2).sum == 101L)
  }
}
