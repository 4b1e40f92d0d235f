package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Greedy farthest-point k-center selection (Gonzalez 1985's 2-approx)
  * — diverse coreset / eval-set seeding over an embedding corpus: pick
  * the point farthest from the chosen set, k−1 times. The selected set
  * covers the corpus within 2× the optimal k-center radius, which is
  * what "spread the eval probes / dedup the prompt seeds" asks for.
  *
  * Fully deterministic and oracle-replayable: distances are EXACT
  * int64 squared L2 over [[Knn.scaledVec]] vectors — d² = ‖a‖² + ‖c‖²
  * − 2·a·c with every term a [[graft.functions.DotScaled]] long — so
  * argmax/argmin comparisons are integer (no float-order tie hazards);
  * ties break on the smaller id. Seed = the minimum-id vector.
  *
  * Scale shape: k passes over the corpus (the algorithm's lower
  * bound), each pass one codegen'd map (dot against a broadcast
  * center literal) + one bounded TakeOrdered(1); the running min-
  * distance frame is eagerly pinned per round (fresh-stats discipline,
  * [[graft.stats.BradleyTerry]] precedent) so round j never re-executes
  * rounds 0..j−1. The scaled vectors ride along in the pinned frame —
  * at corpus scale you would keep (id, dmin) slim and re-join the
  * bucketed corpus instead; both spellings are k-pass. */
object KCenter {

  /** One selected center: selection ordinal, source id, scaled vector,
    * scaled squared norm. */
  final case class Center(ord: Int, id: Long, sv: Seq[Long], n2: Long)

  private def d2To(svLit: Seq[Long], n2Lit: Long) =
    col("n2") + lit(n2Lit) -
      lit(2L) * call_function("dot_scaled", col("sv"), typedlit(svLit))

  /** Greedy selection of k centers. One bounded 1-row collect per
    * round. */
  def centers(corpus: DataFrame, idCol: String, vecCol: String,
              k: Int): Seq[Center] = {
    graft.functions.DotScaled.register(corpus.sparkSession)
    val base = corpus.select(col(idCol).cast("long").as("id"),
        Knn.scaledVec(col(vecCol)).as("sv"))
      .withColumn("n2", call_function("dot_scaled", col("sv"), col("sv")))
    def asCenter(ord: Int, r: Row): Center =
      Center(ord, r.getAs[Long]("id"),
        r.getSeq[Long](r.fieldIndex("sv")).toVector, r.getAs[Long]("n2"))
    val seed = asCenter(0,
      base.orderBy(col("id").asc).limit(1).collect().head)
    val spark = corpus.sparkSession
    def pin(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint(eager = true)
      spark.createDataFrame(ck.rdd, ck.schema) // fresh LogicalRDD stats
    }
    var st = pin(base.withColumn("dmin", d2To(seed.sv, seed.n2)))
    var out = Vector(seed)
    while (out.length < k) {
      val next = asCenter(out.length,
        st.orderBy(col("dmin").desc, col("id").asc).limit(1).collect().head)
      out :+= next
      if (out.length < k) {
        st = pin(st.withColumn("dmin",
          least(col("dmin"), d2To(next.sv, next.n2))))
      }
    }
    out
  }

  /** Driver-side Gonzalez over a BOUNDED point set — the reduce step
    * of merge-and-reduce coreset maintenance ([[graft.streaming.StreamKCenter]]):
    * same greedy, same integer distances, same tie-breaks as
    * [[centers]], pure Scala over ≤ 2k rows. */
  def reduceCenters(points: Seq[(Long, Seq[Long])], k: Int): Seq[Center] = {
    require(points.nonEmpty, "reduceCenters needs at least one point")
    def n2(v: Seq[Long]): Long = { var s = 0L; v.foreach(x => s += x * x); s }
    def d2(a: Seq[Long], b: Seq[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val sorted = points.sortBy(_._1)
    var out = Vector(Center(0, sorted.head._1, sorted.head._2.toVector,
      n2(sorted.head._2)))
    var dmin: Map[Long, Long] =
      sorted.map(p => p._1 -> d2(p._2, out.head.sv)).toMap
    val byId = sorted.toMap
    while (out.length < math.min(k, sorted.length)) {
      val (nid, _) = dmin.toSeq.maxBy { case (id, d) => (d, -id) }
      val v = byId(nid).toVector
      out :+= Center(out.length, nid, v, n2(v))
      dmin = dmin.map { case (id, d) => id -> math.min(d, d2(byId(id), v)) }
    }
    out
  }

  /** Nearest-center assignment of every corpus vector against the
    * selected set: (id, ord, center_id, d2), integer distances, ties
    * to the lower ordinal. The centers are driver-side literals, so
    * the argmin is a MAP-ONLY `array_min` over one struct<d2, ord>
    * per center — no crossJoin row multiplication, no per-id window
    * shuffle; at corpus scale this is one codegen'd pass. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             cs: Seq[Center]): DataFrame = {
    graft.functions.DotScaled.register(corpus.sparkSession)
    val base = corpus.select(col(idCol).cast("long").as("id"),
        Knn.scaledVec(col(vecCol)).as("sv"))
      .withColumn("n2", call_function("dot_scaled", col("sv"), col("sv")))
    // struct comparison orders by field position: d2 first, ord breaks
    // ties to the lower ordinal
    val best = array_min(array(cs.map(c =>
      struct(
        (col("n2") + lit(c.n2) -
          lit(2L) * call_function("dot_scaled", col("sv"), typedlit(c.sv)))
          .as("d2"),
        lit(c.ord).as("ord"))): _*))
    val ids = map(cs.flatMap(c => Seq(lit(c.ord), lit(c.id))): _*)
    base.withColumn("__best", best)
      .select(col("id"), col("__best.ord").as("ord"),
        element_at(ids, col("__best.ord")).as("center_id"),
        col("__best.d2").as("d2"))
  }
}
