package graft.similarity

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance re-rank — diversity-aware top-k over ANN
  * candidates (dedup-aware retrieval, diverse exemplar selection for
  * curation audits). Greedy MMR with equal relevance/diversity weight:
  * seed with the most relevant candidate, then repeatedly take
  * `argmax rel(c) − max_{s∈selected} sim(c, s)`.
  *
  * Scale shape: the candidate generation is the only corpus-sized work
  * (a brute-force or ANN top-`candK` per query); the greedy loop runs
  * per query over the BOUNDED candidate set (candK² sims, candK·k
  * steps), as a `flatMapGroups` over rows that never exceed candK² per
  * group — driver sees nothing, state is one candidate matrix. The
  * greedy fill is inherently sequential per query (each pick changes
  * the next argmax), so a per-group loop is the honest implementation,
  * exactly the [[graft.text.Packing]] justification.
  *
  * Determinism: relevance and similarity are e9-floor-scaled longs
  * from scaled-long cosines, so every argmax compares integers (ties
  * by id) and any engine replays the identical selection — the q117
  * oracle re-runs the whole greedy recursion as a recursive CTE.
  */
object Mmr {

  private def relE9(dot: org.apache.spark.sql.Column,
                    n2a: org.apache.spark.sql.Column,
                    n2b: org.apache.spark.sql.Column) =
    floor(dot / (sqrt(n2a) * sqrt(n2b)) * lit(1e9) + lit(0.5)).cast("long")

  /** Top-`k` diverse results per query from `candK` brute-force
    * candidates: (qid, pos, nid) with pos 1..k in selection order. */
  def rerank(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, candK: Int, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cv = corpus.select(col(idCol).as("nid"), Knn.scaledVec(col(vecCol)).as("__cv"))
      .withColumn("__cn2", Knn.norm2Scaled(col("__cv")))
    val qv = broadcast(queries.select(col(idCol).as("qid"),
        Knn.scaledVec(col(vecCol)).as("__qv"))
      .withColumn("__qn2", Knn.norm2Scaled(col("__qv"))))
    val rel = cv.join(qv, col("qid") =!= col("nid"))
      .withColumn("__rel_e9",
        relE9(Knn.dotScaled(col("__qv"), col("__cv")), col("__qn2"), col("__cn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("__rel_e9").desc, col("nid").asc)
    val cand = rel.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= candK)
      .select(col("qid"), col("__r"), col("nid"), col("__rel_e9"),
        col("__cv"), col("__cn2"))
    // bounded candK² pair rows per query: every (ra, rb) sim
    val a = cand.select(col("qid"), col("__r").as("__ra"), col("nid"),
      col("__rel_e9"), col("__cv").as("__va"), col("__cn2").as("__na"))
    val b = cand.select(col("qid"), col("__r").as("__rb"),
      col("__cv").as("__vb"), col("__cn2").as("__nb"))
    val pairs = a.join(b, "qid")
      .withColumn("__sim_e9",
        relE9(Knn.dotScaled(col("__va"), col("__vb")), col("__na"), col("__nb")))
      .select(col("qid"), col("__ra"), col("__rb"), col("nid"),
        col("__rel_e9"), col("__sim_e9"))
      .as[(Long, Int, Int, Long, Long, Long)]
    greedy(pairs, k).toDF("qid", "pos", "nid")
  }

  /** The per-query greedy fill over (qid, ra, rb, nidA, relA, sim). */
  private def greedy(pairs: Dataset[(Long, Int, Int, Long, Long, Long)],
                     k: Int): Dataset[(Long, Long, Long)] = {
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val rows = it.toArray
      val c = rows.iterator.map(_._2).max
      val nid = new Array[Long](c + 1)
      val rel = new Array[Long](c + 1)
      val sim = Array.ofDim[Long](c + 1, c + 1)
      rows.foreach { case (_, ra, rb, na, relA, s) =>
        nid(ra) = na; rel(ra) = relA; sim(ra)(rb) = s
      }
      val sel = scala.collection.mutable.ArrayBuffer(1) // seed: top relevance
      while (sel.length < math.min(k, c)) {
        var bestR = -1
        var bestScore = Long.MinValue
        var bestNid = Long.MaxValue
        var r = 1
        while (r <= c) {
          if (!sel.contains(r)) {
            var maxSim = Long.MinValue
            sel.foreach { s => if (sim(r)(s) > maxSim) maxSim = sim(r)(s) }
            val score = rel(r) - maxSim
            if (score > bestScore || (score == bestScore && nid(r) < bestNid)) {
              bestR = r; bestScore = score; bestNid = nid(r)
            }
          }
          r += 1
        }
        sel += bestR
      }
      sel.iterator.zipWithIndex.map { case (r, i) => (qid, (i + 1).toLong, nid(r)) }
    }
  }
}
