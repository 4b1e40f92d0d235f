package graft

import graft.text.LangModel
import org.apache.spark.sql.functions._

/** Importance-weighted selection (q126's kernel): with genuinely
  * distinct domains, logprob(target) − logprob(base) separates
  * target-domain candidates from base-domain ones. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("perplexity-difference weights rank target-domain docs first") {
    val target = Seq(
      (1L, "quantum flux lattice entangles the photon cavity resonator"),
      (2L, "the photon cavity drives quantum flux through the lattice"),
      (3L, "resonator cavity photon lattice quantum flux entangles fields"))
      .toDF("doc_id", "text")
    val base = Seq(
      (11L, "market prices rallied as traders bought commodity futures"),
      (12L, "commodity futures fell while traders sold market positions"),
      (13L, "the market traders priced futures on commodity positions"))
      .toDF("doc_id", "text")
    val cand = Seq(
      (21L, "quantum flux entangles the photon lattice"),   // target-domain
      (22L, "traders bought commodity futures on the market"), // base-domain
      (23L, "the photon resonator cavity entangles quantum fields"),
      (24L, "market positions fell as futures traders sold"))
      .toDF("doc_id", "text")
    val mT = LangModel.train(target, "doc_id", "text")
    val mB = LangModel.train(base, "doc_id", "text")
    val w = LangModel.score(cand, mT, "doc_id", "text")
      .select($"doc", $"logprob".as("lpT"))
      .join(LangModel.score(cand, mB, "doc_id", "text")
        .select($"doc", $"logprob".as("lpB")), "doc")
      .withColumn("w", $"lpT" - $"lpB")
      .select($"doc", $"w").as[(Long, Double)].collect().toMap
    assert(w(21L) > 0 && w(23L) > 0, s"target docs must score positive: $w")
    // absolute sign of base docs is smoothing-noise-sensitive on tiny
    // corpora (the ln(1/V) floor differs with vocabulary size); the
    // selector only consumes the RANKING, so that is what's asserted
    assert(Seq(21L, 23L).map(w).min > Seq(22L, 24L).map(w).max,
      s"every target doc outranks every base doc: $w")
  }
}
