package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming naive-Bayes language router — the SERVING arm of the
  * q364/q389/q390 family: the model is COUNTED batch-side (the q364
  * aggregation), and an unbounded document stream scores against it
  * via one stream-static join + ONE stream aggregation, with
  * low-margin docs routed to `review` and confident ones to `auto`
  * (the q390 uncertainty gate, online).
  *
  * Shape constraints drove the design: Structured Streaming allows a
  * single aggregation, so the per-(doc, lang) fold + per-doc argmax of
  * the batch scorer collapses into per-LANG conditional sums inside
  * one `groupBy(doc)` — languages are a bounded property of the model
  * (collected once at construction, like the repo's other bounded
  * dims), so the wide aggregation is L columns, not a second shuffle.
  * The per-token likelihood table joins WIDE (one row per token with
  * every language's count) so an unseen (token, lang) pair floors
  * exactly as in the batch scorer. Per-token math is bit-identical to
  * [[graft.queries.CorpusStatQueries]]'s batch chain (e9-floored exact
  * sums, e6-floored scores), so batch ≡ stream per document.
  */
object StreamNbGate {

  /** A trained router: `likeWide` = (w, c_0..c_{L-1}); scalars are
    * bounded model properties (L totals, vocab size, priors). */
  final case class NbModel(likeWide: DataFrame, langs: Seq[String],
                           tot: Map[String, Long], v: Long,
                           priorE9: Map[String, Long])

  def train(docs: DataFrame, langCol: String, textCol: String): NbModel = {
    val toks = docs.select(col(langCol).as("ml"),
      explode(graft.text.TextFunctions.wsTokens(col(textCol))).as("w"))
    val cnt = toks.groupBy(col("ml"), col("w"))
      .agg(count(lit(1)).cast("long").as("c"))
    // bounded collects: language list, per-language totals, vocab size,
    // prior log-odds — the same driver-side scalar class as the repo's
    // vocab tables (L rows + 1 scalar, never corpus-sized)
    val langs = cnt.select(col("ml")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val tot = cnt.groupBy(col("ml")).agg(sum(col("c")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v = toks.agg(countDistinct(col("w"))).collect()(0).getLong(0)
    val nl = docs.groupBy(col(langCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nAll = nl.values.sum
    val priorE9 = nl.map { case (l, n) =>
      l -> math.floor(math.log(n.toDouble / nAll) * 1e9 + 0.5).toLong
    }
    val likeWide = cnt.groupBy(col("w"))
      .pivot("ml", langs).sum("c")
      .select(col("w") +: langs.zipWithIndex.map { case (l, i) =>
        coalesce(col(l), lit(0L)).as(s"c_$i")
      }: _*)
    NbModel(likeWide, langs, tot, v, priorE9)
  }

  /** Score + route a (doc, text) stream. Works identically on a batch
    * frame (the spec's parity gate). Output: (doc, pred_lang,
    * margin_e6, verdict). */
  def route(stream: DataFrame, model: NbModel, idCol: String,
            textCol: String, reviewBelowE6: Long): DataFrame = {
    val L = model.langs.length
    require(L >= 2, "router needs at least two languages")
    val toks = stream.select(col(idCol).as("doc"),
        explode(graft.text.TextFunctions.wsTokens(col(textCol))).as("w"))
      .join(model.likeWide, Seq("w"), "left")
    def lp(i: Int): Column = {
      val l = model.langs(i)
      log((coalesce(col(s"c_$i"), lit(0L)) + 1).cast("double")
        / lit(model.tot(l) + model.v).cast("double"))
    }
    val scored = toks.groupBy(col("doc"))
      .agg(graft.core.Exact.lsumAt(lp(0), 1e9).as("s_0"),
        (1 until L).map(i =>
          graft.core.Exact.lsumAt(lp(i), 1e9).as(s"s_$i")): _*)
    val withScores = model.langs.zipWithIndex.foldLeft(scored) {
      case (df, (l, i)) =>
        df.withColumn(s"e6_$i",
          floor((col(s"s_$i") + lit(model.priorE9(l)) / lit(1e9)) * 1e6
            + 0.5).cast("long"))
    }
    val best = greatest(model.langs.indices.map(i => col(s"e6_$i")): _*)
    // argmax with the batch tie-break (lang ascending = first match in
    // the sorted language list)
    val pred = model.langs.zipWithIndex.tail.foldLeft(
      when(col("e6_0") === best, lit(model.langs.head))) {
      case (acc, (l, i)) => acc.when(col(s"e6_$i") === best, lit(l))
    }
    val routed = withScores.withColumn("pred_lang", pred)
    // second-best: the max over the non-predicted languages
    val second = model.langs.zipWithIndex.tail.foldLeft(
      when(col("pred_lang") === model.langs.head,
        greatest(model.langs.indices.tail.map(i => col(s"e6_$i")): _*))) {
      case (acc, (l, i)) =>
        val others = model.langs.indices.filter(_ != i)
        acc.when(col("pred_lang") === l,
          if (others.length == 1) col(s"e6_${others.head}")
          else greatest(others.map(j => col(s"e6_$j")): _*))
    }
    routed
      .withColumn("margin_e6", best - second)
      .withColumn("verdict",
        when(col("margin_e6") < reviewBelowE6, lit("review"))
          .otherwise(lit("auto")))
      .select(col("doc"), col("pred_lang"), col("margin_e6"), col("verdict"))
  }
}
