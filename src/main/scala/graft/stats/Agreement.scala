package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Exact

/** Inter-annotator agreement — the labeler-quality gate every
  * human-annotation pipeline (preference data, safety labels, quality
  * ratings) runs before trusting its labels. Two standards:
  *
  *  - Cohen's kappa (two fixed raters): observed agreement corrected
  *    for chance, κ = (p_o − p_e) / (1 − p_e) with p_e from the two
  *    raters' marginal label distributions (Cohen 1960).
  *  - Krippendorff's alpha (nominal metric, any number of raters per
  *    unit): α = 1 − D_o/D_e over the coincidence matrix, each unit u
  *    with m_u ratings contributing 1/(m_u−1) per ordered pair of its
  *    ratings (Krippendorff, Content Analysis, ch. 12).
  *
  * Both reduce to integer-count aggregations plus a handful of final
  * IEEE divisions, so the results are bit-reproducible at any
  * parallelism and replayable by an ANSI oracle:
  *
  *  - kappa needs only the joint label-pair census (one groupBy over
  *    the double-labeled rows);
  *  - alpha's coincidence pairs come from a within-unit self-join,
  *    bounded because m_u = raters-per-unit is small (2–5 in any real
  *    annotation design) — the join is on unit id, so at 100 TB it is
  *    one hash shuffle on unit with tiny per-key groups, never a
  *    cross of the corpus. To keep everything integer-exact the
  *    per-pair weight 1/(m_u−1) is carried as a RATIONAL: numerators
  *    are multiplied by Π(m−1) of the OTHER multiplicities' lcm —
  *    here simply by using per-unit weight scaled by L/(m_u−1) where
  *    L = lcm of observed (m_u−1) values, bounded (≤ raters!).
  */
object Agreement {

  /** Cohen's kappa for exactly two raters.
    *
    * @param labels one row per (unit, labelA, labelB)
    * @return one row: (n_units, p_o, p_e, kappa)
    */
  def cohenKappa(labels: DataFrame, labelACol: String,
                 labelBCol: String): DataFrame = {
    val la = col(labelACol); val lb = col(labelBCol)
    // joint census: everything downstream is arithmetic over these counts
    val cells = labels.groupBy(la.as("la"), lb.as("lb"))
      .agg(count(lit(1)).as("n"))
    val aMarg = cells.groupBy(col("la").as("l")).agg(sum(col("n")).as("na"))
    val bMarg = cells.groupBy(col("lb").as("l")).agg(sum(col("n")).as("nb"))
    val n = cells.agg(sum(col("n")).as("n_units"),
      sum(when(col("la") === col("lb"), col("n")).otherwise(lit(0L))).as("agree"))
    // Σ_k na_k·nb_k and n² routed through DECIMAL(38,0): marginal
    // products overflow int64 past ~3e9 double-labeled rows, and the
    // doc's 100 TB framing must hold. Decimal keeps them EXACT (n ≤
    // 9.2e18 → n² ≤ 8.5e37 fits 38 digits), so the single cast to
    // double rounds once — bit-identical to the int64 spelling
    // wherever that didn't overflow.
    val pe = aMarg.join(bMarg, Seq("l"))
      .agg(sum(col("na").cast("decimal(19,0)") *
        col("nb").cast("decimal(19,0)")).as("pe_num"))
    n.crossJoin(pe)
      .select(
        col("n_units"),
        (col("agree").cast("double") / col("n_units")).as("p_o"),
        (col("pe_num").cast("double") /
          (col("n_units").cast("decimal(19,0)") *
            col("n_units").cast("decimal(19,0)")).cast("double")).as("p_e"))
      .withColumn("kappa",
        (col("p_o") - col("p_e")) / (lit(1.0) - col("p_e")))
  }

  /** Krippendorff's alpha, nominal metric, arbitrary raters per unit.
    *
    * @param ratings one row per (unit, rater, label); units with a
    *                single rating contribute nothing (standard)
    * @param scale   integer scale L that must be divisible by every
    *                observed (m_u − 1) so coincidence weights L/(m_u−1)
    *                stay integral (e.g. lcm(1..maxRaters−1))
    * @return one row: (n_coincidence, d_o, d_e, alpha)
    */
  /** The scaled coincidence matrix shared by every alpha metric:
    * `co(c, k, o_ck)` (ordered label pairs, weights ×S integral by the
    * scale contract) and its marginals `nC(c, n_c)`. */
  private def scaledCoincidence(ratings: DataFrame, unitCol: String,
                                raterCol: String, labelCol: String,
                                scale: Long): (DataFrame, DataFrame) = {
    val u = col(unitCol)
    val m = ratings.groupBy(u.as("unit")).agg(count(lit(1)).as("m"))
      .filter(col("m") > 1)
    val r = ratings.select(u.as("unit"), col(raterCol).as("rater"),
      col(labelCol).as("label"))
    // ordered within-unit pairs of distinct ratings; weight L/(m_u-1)
    // kept integral by the caller-supplied scale
    val pairs = r.join(r.withColumnRenamed("rater", "rater2")
        .withColumnRenamed("label", "label2"), Seq("unit"))
      .filter(col("rater") =!= col("rater2"))
      .join(m, Seq("unit"))
      .select(col("label").as("c"), col("label2").as("k"),
        // integral by the scale contract (S % (m_u-1) == 0); the double
        // division is exact at these magnitudes, the cast restores int64
        (lit(scale) / (col("m") - 1)).cast("long").as("w"))
    val co = pairs.groupBy(col("c"), col("k")).agg(sum(col("w")).as("o_ck"))
    val nC = co.groupBy(col("c")).agg(sum(col("o_ck")).as("n_c"))
    (co, nC)
  }

  def krippendorffAlpha(ratings: DataFrame, unitCol: String,
                        raterCol: String, labelCol: String,
                        scale: Long): DataFrame = {
    // all *_s quantities are scaled by S; the true coincidence total
    // n = n_s/S is integral by construction (each unit contributes
    // exactly m_u coincidences: m_u(m_u-1) ordered pairs × 1/(m_u-1))
    val (co, nC) = scaledCoincidence(ratings, unitCol, raterCol, labelCol, scale)
    // squared terms through DECIMAL(38,0): n_c² (and n_s·(n_s−S)
    // below) overflow int64 past ~3e9 scaled coincidences; decimal is
    // exact to 38 digits so the one cast to double still rounds once
    val tot = nC.agg(sum(col("n_c")).as("n_s"),
      sum(col("n_c").cast("decimal(19,0)") *
        col("n_c").cast("decimal(19,0)")).as("sum_nc2_s2"))
    val doNum = co.filter(col("c") =!= col("k"))
      .agg(coalesce(sum(col("o_ck")), lit(0L)).as("do_num_s"))
    // the scale cancels into pure int64 arithmetic:
    //   D_o = (do_num_s/S) / n               = do_num_s / n_s
    //   D_e = ((n_s²−Σn_c_s²)/S²) / (n(n−1)) = (n_s²−Σn_c_s²) / (n_s(n_s−S))
    // leaving exactly two IEEE divisions + one subtraction for alpha
    doNum.crossJoin(tot)
      .select(
        floor(col("n_s") / scale).cast("long").as("n_coincidence"),
        (col("do_num_s").cast("double") / col("n_s")).as("d_o"),
        ((col("n_s").cast("decimal(19,0)") * col("n_s").cast("decimal(19,0)")
          - col("sum_nc2_s2")).cast("double") /
          (col("n_s").cast("decimal(19,0)") *
            (col("n_s") - lit(scale)).cast("decimal(19,0)")).cast("double"))
          .as("d_e"))
      .withColumn("alpha", lit(1.0) - col("d_o") / col("d_e"))
  }

  /** Krippendorff's alpha for INTEGER-scaled ratings under the
    * interval or ordinal difference metric (Krippendorff, Content
    * Analysis ch. 12) — the forms scalar annotation pipelines
    * (quality 1–5, preference strength) actually need: disagreeing by
    * one step must cost less than disagreeing across the scale, which
    * the nominal c≠k indicator cannot express.
    *
    *   α = 1 − D_o/D_e,   D_o = Σ o_ck·δ²(c,k) / n,
    *                      D_e = Σ n_c·n_k·δ²(c,k) / (n(n−1))
    *
    *  - interval: δ(c,k) = c − k
    *  - ordinal:  δ(c,k) = Σ_{g=c..k} n_g − (n_c + n_k)/2 (ranks
    *    weighted by how often they were used — the standard ordinal
    *    metric over the coincidence marginals)
    *
    * Exactness: both metrics reduce to the UNIFIED integer quantity
    * Q(c,k) — 2S(c−k) for interval, 2(ncum_k − ncum_c) + n_c − n_k on
    * the S-scaled marginals for ordinal — with δ² = Q²/(4S²), so
    * every sum is integer (DECIMAL(38,0)-routed; Q ≤ 2n_s keeps Q²
    * products exact to n_s ≈ 1e12 scaled coincidences) and each of
    * d_o/d_e is ONE double division, replayable in ANSI SQL.
    *
    * Scale shape: the per-unit pair join is the only data-sized step
    * (same as the nominal form); everything after lives on the
    * BOUNDED label frame (L distinct ratings → L rows, L² pairs), so
    * the single-partition cumulative window costs L rows, never data.
    *
    * @param metric "interval" or "ordinal"
    * @return one row: (metric, n_coincidence, d_o, d_e, alpha) */
  def krippendorffAlphaMetric(ratings: DataFrame, unitCol: String,
                              raterCol: String, labelCol: String,
                              scale: Long, metric: String): DataFrame = {
    require(metric == "interval" || metric == "ordinal",
      s"unknown alpha metric $metric")
    val (co, nC0) = scaledCoincidence(
      ratings.select(col(unitCol), col(raterCol),
        col(labelCol).cast("long").as(labelCol)),
      unitCol, raterCol, labelCol, scale)
    val wC = Window.partitionBy().orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val marg = nC0.withColumn("ncum", sum(col("n_c")).over(wC))
    val a = marg.select(col("c"), col("n_c").as("__nc1"), col("ncum").as("__cum1"))
    val b = marg.select(col("c").as("k"), col("n_c").as("__nc2"),
      col("ncum").as("__cum2"))
    // Q is antisymmetric in (c,k) for both metrics (ordinal: the
    // signed cum difference flips with the pair order; c = k gives 0),
    // so Q² needs no c<=k canonicalization
    val q = metric match {
      case "interval" => lit(2L * scale) * (col("c") - col("k"))
      case "ordinal" =>
        lit(2L) * (col("__cum2") - col("__cum1")) + col("__nc1") - col("__nc2")
    }
    val lp = a.crossJoin(b) // bounded: L² label pairs
      .select(col("c"), col("k"),
        (q.cast("decimal(19,0)") * q.cast("decimal(19,0)")).as("__q2"),
        (col("__nc1").cast("decimal(19,0)") *
          col("__nc2").cast("decimal(19,0)")).as("__nn"))
    val tot = nC0.agg(sum(col("n_c")).as("n_s"))
    val numO = co.join(broadcast(lp), Seq("c", "k"))
      .agg(coalesce(sum(col("o_ck").cast("decimal(19,0)") * col("__q2")),
        lit(0).cast("decimal(38,0)")).as("__num_o"))
    val numE = lp.agg(sum(col("__nn") * col("__q2")).as("__num_e"))
    val s4 = lit(4L * scale * scale).cast("decimal(19,0)")
    numO.crossJoin(numE).crossJoin(tot)
      .select(
        lit(metric).as("metric"),
        floor(col("n_s") / scale).cast("long").as("n_coincidence"),
        (col("__num_o").cast("double") /
          (s4 * col("n_s").cast("decimal(19,0)")).cast("double")).as("d_o"),
        (col("__num_e").cast("double") /
          (s4 * col("n_s").cast("decimal(19,0)") *
            (col("n_s") - lit(scale)).cast("decimal(19,0)")).cast("double"))
          .as("d_e"))
      .withColumn("alpha", lit(1.0) - col("d_o") / col("d_e"))
  }
}
