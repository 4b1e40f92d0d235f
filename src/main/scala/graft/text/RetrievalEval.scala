package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation — the metrics layer every retrieval
  * stack in this engine (BM25 q112, RRF fusion q136, ANN rerank) gets
  * judged by: per query, recall@k, reciprocal rank of the first
  * relevant hit (MRR when macro-averaged), and nDCG@k with graded
  * relevance (gain 2^rel − 1, log2 discount — the standard TREC/web
  * formulation).
  *
  * Execution shape: one (query, doc) equi-join of the top-k run
  * against the positive qrels, one window over the qrels for the
  * ideal DCG, two bounded aggregations — work scales with |run| +
  * |qrels|, never |queries|·|corpus|. Arithmetic is IEEE ln/divide
  * over integer counts (the q112 determinism contract), so any engine
  * replays every metric bit-for-bit.
  *
  * Semantics at the edges (mirrored by the q193 oracle): a query with
  * NO positive qrels gets NULL recall/rr/ndcg (undefined, not zero —
  * averaging code must not count it as a failure); a query whose
  * top-k contains no relevant doc gets 0.0 for all three. */
object RetrievalEval {

  /** Per-query metrics: (qCol, n_rel, n_hits, recall, rr, ndcg), all
    * metric columns rounded to 6.
    *
    * @param runs  ranked results: qCol, docCol, rankCol (1-based,
    *              unique per query; rows with rank > k are ignored)
    * @param qrels graded relevance: qCol, docCol, relCol ≥ 0
    *              (absent pairs mean 0; duplicates must not occur) */
  def metrics(runs: DataFrame, qrels: DataFrame, qCol: String, docCol: String,
              rankCol: String, relCol: String, k: Int): DataFrame = {
    val log2 = (c: org.apache.spark.sql.Column) => log(c) / log(lit(2.0))
    val topk = runs.filter(col(rankCol) <= k)
      .select(col(qCol), col(docCol), col(rankCol))
    val rel = qrels.filter(col(relCol) > 0)
    // ideal DCG@k: per query, the k best grades in (rel desc, doc asc)
    // deterministic order
    val wI = Window.partitionBy(col(qCol))
      .orderBy(col(relCol).desc, col(docCol).asc)
    val ideal = rel.withColumn("__ir", row_number().over(wI))
      .groupBy(col(qCol))
      .agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("__ir") <= k,
          (pow(lit(2.0), col(relCol)) - 1.0) / log2(col("__ir") + 1.0))
          .otherwise(lit(0.0))).as("__idcg"))
    val hits = topk.join(rel, Seq(qCol, docCol))
      .groupBy(col(qCol))
      .agg(
        count(lit(1)).as("n_hits"),
        min(col(rankCol)).as("__r1"),
        sum((pow(lit(2.0), col(relCol)) - 1.0) / log2(col(rankCol) + 1.0))
          .as("__dcg"))
    runs.select(col(qCol)).distinct()
      .join(ideal, Seq(qCol), "left")
      .join(hits, Seq(qCol), "left")
      .select(col(qCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(when(col("n_rel").isNotNull,
          coalesce(col("n_hits"), lit(0L)).cast("double") /
            col("n_rel").cast("double")), 6).as("recall"),
        round(when(col("n_rel").isNotNull,
          coalesce(lit(1.0) / col("__r1"), lit(0.0))), 6).as("rr"),
        round(when(col("n_rel").isNotNull,
          coalesce(col("__dcg"), lit(0.0)) / col("__idcg")), 6).as("ndcg"))
  }
}
