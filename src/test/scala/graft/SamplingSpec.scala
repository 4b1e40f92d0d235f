package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic stratified sampling / mixing: membership stability,
  * cap semantics, and mixture-plan arithmetic. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0 until 1000).map(i =>
    (i.toLong, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "es", i % 97 + 10))
    .toDF("id", "lang", "w")

  test("sampleByRate: deterministic membership, stable under repartitioning; 0 and 1 edges") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.sampleByRate(df, col("lang"), col("id"), Map("en" -> 0.5, "de" -> 0.0),
        defaultRate = 1.0)
        .select("id").as[Long].collect().toSet
    val a = ids(docs)
    assert(a == ids(docs.repartition(7)))
    val byLang = docs.filter(col("id").isInCollection(a.toSeq))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!byLang.contains("de"))            // rate 0 drops all
    assert(byLang("es") == 500L)              // default rate 1 keeps all
    val enKept = byLang("en")
    assert(enKept > 75 && enKept < 175, s"~50% of 250 expected, got $enKept")
  }

  test("takePerStratum: exact cap, stable membership, grows only at the margin") {
    val capped = Sampling.takePerStratum(docs, Seq("lang"), col("id"), n = 20)
    val counts = capped.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 20L))
    // determinism under partitioning
    val again = Sampling.takePerStratum(docs.repartition(5), Seq("lang"), col("id"), 20)
    assert(capped.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet)
    // a grown stratum keeps the previous winners minus at most the margin:
    // the original sample from a PREFIX of the data is a superset filter
    val small = Sampling.takePerStratum(docs.filter(col("id") < 500), Seq("lang"), col("id"), 20)
      .select("id").as[Long].collect().toSet
    val full = capped.select("id").as[Long].collect().toSet
    // every full-data winner with id < 500 must also win on the prefix
    assert(full.filter(_ < 500).subsetOf(small))
  }

  test("weightedSample: exact n, deterministic under repartitioning, nonpositive weights excluded, top-n plan") {
    val sampled = Sampling.weightedSample(docs, col("id"), col("w"), n = 100)
    val ids = sampled.select("id").as[Long].collect().toSet
    assert(ids.size == 100)
    val again = Sampling.weightedSample(docs.repartition(7), col("id"), col("w"), 100)
      .select("id").as[Long].collect().toSet
    assert(ids == again)
    // zero/negative/null weights can never be drawn
    val withBad = docs.withColumn("w",
      when(col("id") < 900, -col("w")).otherwise(col("w")))
    val onlyValid = Sampling.weightedSample(withBad, col("id"), col("w"), 100)
      .select("id").as[Long].collect()
    assert(onlyValid.forall(_ >= 900) && onlyValid.length == 100)
    // n larger than the valid pool returns the whole pool
    assert(Sampling.weightedSample(withBad, col("id"), col("w"), 500).count() == 100)
    // scale shape: bounded per-partition top-n, not a global sort
    val plan = sampled.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-n plan:\n$plan")
  }

  test("weightedSample: heavier rows win proportionally more often") {
    // two weight classes 10 vs 1; in an A-ES sample of 200 from 500+500
    // the heavy class must dominate (expected ~91% of draws)
    val pool = (0 until 1000).map(i => (i.toLong, if (i < 500) 10.0 else 1.0))
      .toDF("id", "w")
    val heavy = Sampling.weightedSample(pool, col("id"), col("w"), 200)
      .filter(col("id") < 500).count()
    assert(heavy > 150, s"heavy class underdrawn: $heavy of 200")
  }

  test("mixturePlan: binding stratum keeps rate 1, others realize the target mix; absent stratum rate 0") {
    val observed = Seq(("en", 1000.0), ("de", 100.0), ("es", 500.0))
      .toDF("lang", "w")
    val plan = Sampling.mixturePlan(observed, "lang", "w",
      Map("en" -> 0.5, "de" -> 0.5))
      .select("lang", "rate").as[(String, Double)].collect().toMap
    // de is binding (100/0.5 = 200 < 1000/0.5 = 2000): rate 1; en
    // downsamples to 100 of its 1000 → rate 0.1; es excluded
    assert(plan("de") == 1.0)
    assert(math.abs(plan("en") - 0.1) < 1e-12)
    assert(plan("es") == 0.0)
  }

  test("temperaturePlan: tau=1 keeps the natural mix; tau<1 boosts small strata; shares sum to 1") {
    val observed = Seq(("en", 1600.0), ("de", 400.0), ("es", 100.0)).toDF("lang", "w")
    val nat = Sampling.temperaturePlan(observed, "lang", "w", tau = 1.0)
      .select("lang", "rate").as[(String, Double)].collect().toMap
    // share_i ∝ w_i ⇒ w/share is constant ⇒ every stratum is binding
    nat.values.foreach(r => assert(math.abs(r - 1.0) < 1e-12, nat))
    val cool = Sampling.temperaturePlan(observed, "lang", "w", tau = 0.5)
    val shares = cool.select("lang", "share").as[(String, Double)].collect().toMap
    assert(math.abs(shares.values.sum - 1.0) < 1e-9)
    // sqrt weights: 40/20/10 → the smallest stratum's share more than
    // doubles its natural 100/2100
    assert(shares("es") > 2.0 * (100.0 / 2100.0))
    val rates = cool.select("lang", "rate").as[(String, Double)].collect().toMap
    assert(rates("es") == 1.0, s"smallest stratum binds under tau<1: $rates")
    assert(rates("en") < rates("de") && rates("de") < 1.0, rates)
  }
}
