package graft

import graft.stats.Agreement

/** Inter-annotator agreement: kappa textbook identities (perfect
  * agreement → 1, marginal-independent labels → ~0), Krippendorff
  * alpha on the canonical worked example, and scale-contract
  * robustness for mixed raters-per-unit. */
class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("kappa = 1 on perfect agreement; p_o = 1") {
    val df = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("c", "c"))
      .toDF("la", "lb")
    val r = Agreement.cohenKappa(df, "la", "lb").collect()(0)
    assert(r.getAs[Double]("p_o") == 1.0)
    assert(r.getAs[Double]("kappa") == 1.0)
  }

  test("kappa near 0 when rater B is independent of rater A") {
    // A says x/y alternating; B says x/y on a phase that hits every
    // combination equally → p_o = p_e = 0.5, kappa = 0
    val df = (0 until 400).map { i =>
      (if (i % 2 == 0) "x" else "y", if ((i / 2) % 2 == 0) "x" else "y")
    }.toDF("la", "lb")
    val r = Agreement.cohenKappa(df, "la", "lb").collect()(0)
    assert(math.abs(r.getAs[Double]("p_e") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa")) < 1e-12)
  }

  test("kappa matches the hand-computed 2x2 worked example") {
    // classic: 45 yes/yes, 15 yes/no, 25 no/yes, 15 no/no
    val rows = Seq.fill(45)(("y", "y")) ++ Seq.fill(15)(("y", "n")) ++
      Seq.fill(25)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Agreement.cohenKappa(rows.toDF("la", "lb"), "la", "lb").collect()(0)
    val po = 60.0 / 100
    val pe = (60.0 * 70 + 40.0 * 30) / (100.0 * 100)
    assert(r.getAs[Long]("n_units") == 100L)
    assert(math.abs(r.getAs[Double]("p_o") - po) < 1e-12)
    assert(math.abs(r.getAs[Double]("p_e") - pe) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - (po - pe) / (1 - pe)) < 1e-12)
  }

  test("alpha = 1 on unanimous raters; single-rating units drop") {
    val df = Seq(
      (1L, "r1", "a"), (1L, "r2", "a"), (1L, "r3", "a"),
      (2L, "r1", "b"), (2L, "r2", "b"), (2L, "r3", "b"),
      (3L, "r1", "c") // m=1: contributes nothing
    ).toDF("unit", "rater", "label")
    val r = Agreement.krippendorffAlpha(df, "unit", "rater", "label",
      scale = 2L).collect()(0)
    assert(r.getAs[Double]("d_o") == 0.0)
    assert(r.getAs[Double]("alpha") == 1.0)
    assert(r.getAs[Long]("n_coincidence") == 6L)
  }

  test("alpha matches Krippendorff's nominal worked example") {
    // Krippendorff (2011) nominal example: 2 observers, 10 units
    //   u:  1 2 3 4 5 6 7 8 9 10
    //   A:  a a b b d c c c e d
    //   B:  b a b b b c c c e d
    // coincidences n=20, disagreements: units 1 (a,b) and 5 (d,b)
    val a = Seq("a", "a", "b", "b", "d", "c", "c", "c", "e", "d")
    val b = Seq("b", "a", "b", "b", "b", "c", "c", "c", "e", "d")
    val df = (0 until 10).flatMap { u =>
      Seq((u.toLong, "A", a(u)), (u.toLong, "B", b(u)))
    }.toDF("unit", "rater", "label")
    val r = Agreement.krippendorffAlpha(df, "unit", "rater", "label",
      scale = 1L).collect()(0)
    // by hand: o_ab+o_ba = 2, o_db+o_bd = 2 → Do_num = 4, n = 20
    // label totals over both raters: a:3 b:6 c:6 d:3 e:2
    //   → Σn_c² = 9+36+36+9+4 = 94
    // De = (400−94)/(20·19) ; Do = 4/20
    val dO = 4.0 / 20
    val dE = (400.0 - 94.0) / (20.0 * 19.0)
    assert(r.getAs[Long]("n_coincidence") == 20L)
    assert(math.abs(r.getAs[Double]("d_o") - dO) < 1e-12)
    assert(math.abs(r.getAs[Double]("d_e") - dE) < 1e-12)
    assert(math.abs(r.getAs[Double]("alpha") - (1 - dO / dE)) < 1e-12)
  }

  test("mixed raters-per-unit honors the 1/(m-1) weighting via scale") {
    // unit 1: three raters split 2-1; unit 2: two raters agree
    val df = Seq(
      (1L, "r1", "a"), (1L, "r2", "a"), (1L, "r3", "b"),
      (2L, "r1", "a"), (2L, "r2", "a")).toDF("unit", "rater", "label")
    // scale=2 covers m-1 ∈ {1,2}
    val r = Agreement.krippendorffAlpha(df, "unit", "rater", "label",
      scale = 2L).collect()(0)
    // unit1: 6 ordered pairs × 1/2: o(a,a)=1, o(a,b)=o(b,a)=1 each
    //   (2 ordered (a,b) pairs ×1/2 = 1, symmetric)
    // unit2: 2 ordered pairs × 1/1 = 2 on (a,a)
    // totals: n=5, o_offdiag=2, n_a=4, n_b=1 → Σn_c²=17
    // Do = 2/5 ; De = (25−17)/(5·4) = 0.4 → alpha = 1 − 1 = 0
    assert(r.getAs[Long]("n_coincidence") == 5L)
    assert(math.abs(r.getAs[Double]("d_o") - 0.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("d_e") - 0.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("alpha")) < 1e-12)
  }

  // --- ordinal / interval metrics ---

  /** Krippendorff's canonical 4-observer × 12-unit worked example
    * ("Computing Krippendorff's Alpha-Reliability", 2011; ratings
    * 1–5, missing cells, unit 12 drops with a single rating). */
  private val worked: Seq[(Long, String, Long)] = {
    val na = -1
    val grid = Map(
      "A" -> Seq(1, 2, 3, 3, 2, 1, 4, 1, 2, na, na, na),
      "B" -> Seq(1, 2, 3, 3, 2, 2, 4, 1, 2, 5, na, 3),
      "C" -> Seq(na, 3, 3, 3, 2, 3, 4, 2, 2, 5, 1, na),
      "D" -> Seq(1, 2, 3, 3, 2, 4, 4, 1, 2, 5, 1, na))
    for {
      (rater, vals) <- grid.toSeq
      (v, u) <- vals.zipWithIndex if v != na
    } yield ((u + 1).toLong, rater, v.toLong)
  }

  private def metricAlpha(rows: Seq[(Long, String, Long)], metric: String,
                          scale: Long = 6L) =
    Agreement.krippendorffAlphaMetric(rows.toDF("unit", "rater", "label"),
      "unit", "rater", "label", scale, metric).collect()(0)

  test("interval alpha matches the published worked example (0.849)") {
    val r = metricAlpha(worked, "interval")
    assert(r.getAs[Long]("n_coincidence") == 40L)
    assert(math.abs(r.getAs[Double]("alpha") - 0.8491071428571428) < 1e-12)
  }

  test("ordinal alpha matches the published worked example (0.815)") {
    val r = metricAlpha(worked, "ordinal")
    assert(math.abs(r.getAs[Double]("alpha") - 0.8153875037548813) < 1e-12)
  }

  /** From-scratch rational-arithmetic reference, straight from the
    * textbook formulas (no shared code with the engine). */
  private def bruteAlpha(rows: Seq[(Long, String, Long)],
                         d2: (Long, Long, Map[Long, Double]) => Double): Double = {
    val units = rows.groupBy(_._1).values.filter(_.size > 1)
    val o = scala.collection.mutable.Map[(Long, Long), Double]()
      .withDefaultValue(0.0)
    units.foreach { vs =>
      val m = vs.size
      for (i <- vs.indices; j <- vs.indices if i != j)
        o((vs(i)._3, vs(j)._3)) += 1.0 / (m - 1)
    }
    val labels = rows.map(_._3).distinct.sorted
    val nC = labels.map(c => c -> labels.map(k => o((c, k))).sum).toMap
    val n = nC.values.sum
    val dO = labels.flatMap(c => labels.map(k => o((c, k)) * d2(c, k, nC))).sum / n
    val dE = labels.flatMap(c =>
      labels.map(k => nC(c) * nC(k) * d2(c, k, nC))).sum / (n * (n - 1))
    1.0 - dO / dE
  }

  private def intervalD2(c: Long, k: Long, nC: Map[Long, Double]): Double =
    ((c - k) * (c - k)).toDouble

  private def ordinalD2(c: Long, k: Long, nC: Map[Long, Double]): Double = {
    val (lo, hi) = (math.min(c, k), math.max(c, k))
    val s = nC.collect { case (g, n) if g >= lo && g <= hi => n }.sum
    val d = s - (nC(c) + nC(k)) / 2
    d * d
  }

  test("metric alphas match the brute-force reference on random ratings") {
    val rows = for {
      u <- 0L until 60L
      r <- 0 until (2 + (u % 3).toInt) // 2-4 raters per unit
    } yield (u, s"r$r", (u * 31 + r * r * 17 + r) % 5 + 1)
    assert(math.abs(metricAlpha(rows, "interval").getAs[Double]("alpha")
      - bruteAlpha(rows, intervalD2)) < 1e-9)
    assert(math.abs(metricAlpha(rows, "ordinal").getAs[Double]("alpha")
      - bruteAlpha(rows, ordinalD2)) < 1e-9)
  }

  test("metric alphas = 1 on unanimous raters") {
    val rows = (0L until 10L).flatMap(u =>
      Seq((u, "a", u % 5 + 1), (u, "b", u % 5 + 1)))
    assert(metricAlpha(rows, "interval", 1L).getAs[Double]("alpha") == 1.0)
    assert(metricAlpha(rows, "ordinal", 1L).getAs[Double]("alpha") == 1.0)
  }
}
