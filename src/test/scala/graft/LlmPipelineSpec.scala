package graft

import org.apache.spark.sql.functions._

/** The LLM-side DAG composed end-to-end over the real documents table:
  * curate (NFC → PII → exact-dedup → quality) → near-dup election →
  * token-budget selection → stride schedule → sequence packing. Each
  * stage's output feeds the next unchanged; the assertions are the
  * interlocks a production run relies on (monotone survivorship, token
  * conservation, schedule/packing totals agreeing with the selection). */
class LlmPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curate -> elect -> budget -> schedule -> pack composes with conserved totals") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text")
    val n0 = docs.count()

    // 1. curation: canonical, quality-passing documents
    val curated = graft.text.Curation.kept(docs, "doc_id", "text", minTokens = 10)
      .select($"doc_id", $"lang", $"redacted".as("text"))
      .localCheckpoint(true)
    val n1 = curated.count()
    assert(n1 > 0 && n1 <= n0, s"curation must shrink or hold: $n0 -> $n1")

    // 2. near-dup election on the curated survivors
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(
      curated, "doc_id", "text", k = 5, threshold = 0.2).select($"da", $"db")
    val toks = curated.select($"doc_id", $"lang",
      size(graft.text.TextFunctions.wsTokens($"text")).cast("long").as("n_tokens"))
    val dropped = graft.dedup.Components.electCanonical(
        toks, "doc_id", "n_tokens", pairs, "da", "db")
      .filter(!$"is_canonical").select($"doc_id")
    val canon = toks.join(dropped, Seq("doc_id"), "left_anti").localCheckpoint(true)
    val n2 = canon.count()
    assert(n2 <= n1 && n2 > 0, s"election must shrink or hold: $n1 -> $n2")

    // 3. per-lang token budget
    val budget = 20000L
    val selected = graft.text.Budget.selectUnderBudget(
      canon, Seq("lang"), $"n_tokens", $"n_tokens", $"doc_id", budget)
      .localCheckpoint(true)
    val perLang = selected.groupBy($"lang").agg(sum($"n_tokens").as("t"))
      .as[(String, Long)].collect()
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, t) =>
      assert(t <= budget, s"$lang exceeds budget: $t")
    }

    // 4. stride schedule over the selection (weights = selected doc counts)
    val wts = selected.groupBy($"lang").agg(count(lit(1)).as("w"))
    val keyed = graft.text.Schedule.withScheduleKey(
      selected.join(wts, "lang"), "doc_id", "lang", "w")
    assert(keyed.filter($"schedule_key" > graft.text.Schedule.Scale).isEmpty,
      "every doc schedules within one virtual epoch")
    assert(keyed.count() == selected.count())

    // 5. pack the scheduled docs into fixed 2048-token bins
    val packed = graft.text.Packing.packFirstFit(
      keyed.select($"doc_id", $"n_tokens"), "doc_id", "n_tokens",
      capacity = 2048L, nShards = 4)
    val packedTokens = packed.agg(sum($"n_tokens")).as[Long].head()
    val selectedTokens = selected.agg(sum($"n_tokens")).as[Long].head()
    assert(packedTokens == selectedTokens, "packing conserves the selected tokens")
    val overfull = graft.text.Packing.binStats(packed, 2048L)
      .filter($"n_tokens" > 2048 && $"n_docs" > 1)
    assert(overfull.isEmpty, "no multi-doc bin exceeds capacity")
  }
}
