package graft

import graft.stats.Isotonic

/** Isotonic calibration: textbook pooling cases, weighted pooling, and
  * equality with a sequential PAV reference on irregular data —
  * proving the minimax closed form and the classical stack algorithm
  * agree. */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  /** rows: (score, label) placed so bucket b of B receives the given
    * (n, positives). */
  private def mkRows(B: Int, spec: Seq[(Int, Int, Int)]): Seq[(Double, Int)] =
    spec.flatMap { case (b, n, pos) =>
      val s = (b + 0.5) / B
      Seq.fill(pos)((s, 1)) ++ Seq.fill(n - pos)((s, 0))
    }

  private def fit(B: Int, spec: Seq[(Int, Int, Int)]): Map[Long, Double] =
    Isotonic.calibrate(mkRows(B, spec).toDF("score", "label"),
        "score", "label", B)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Double]("fitted"))
      .toMap

  test("violating pair pools to the weighted average; monotone result") {
    // rates 0.1, 0.3, 0.2, 0.4 -> PAV pools buckets 1,2 to 0.25
    val f = fit(4, Seq((0, 10, 1), (1, 10, 3), (2, 10, 2), (3, 10, 4)))
    assert(f(0L) == 0.1 && f(1L) == 0.25 && f(2L) == 0.25 && f(3L) == 0.4)
  }

  test("weighted pooling honors bucket masses") {
    // rates 0.5 (n=2), 0.25 (n=4) -> pooled (1+1)/6
    val f = fit(2, Seq((0, 2, 1), (1, 4, 1)))
    val want = BigDecimal(2.0 / 6.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(f(0L) == want && f(1L) == want)
  }

  test("already-monotone input is returned unchanged") {
    val f = fit(4, Seq((0, 10, 1), (1, 10, 3), (2, 10, 5), (3, 10, 9)))
    assert(f == Map(0L -> 0.1, 1L -> 0.3, 2L -> 0.5, 3L -> 0.9))
  }

  test("matches a sequential PAV reference on irregular weights") {
    val spec = Seq((0, 7, 5), (1, 3, 1), (2, 11, 6), (3, 2, 2), (4, 9, 1),
      (5, 5, 4), (6, 8, 3), (7, 4, 4))
    // classical stack-based PAV
    case class Block(var w: Long, var y: Long)
    val stack = scala.collection.mutable.ArrayBuffer[Block]()
    spec.foreach { case (_, n, pos) =>
      stack += Block(n.toLong, pos.toLong)
      while (stack.length > 1 && {
        val a = stack(stack.length - 2); val b = stack.last
        a.y.toDouble / a.w >= b.y.toDouble / b.w
      }) {
        val b = stack.remove(stack.length - 1)
        stack.last.w += b.w; stack.last.y += b.y
      }
    }
    // rebuild per-bucket expectation by walking blocks against spec ns
    // (blocks pool WHOLE buckets, so boundaries always align)
    val perBucket = scala.collection.mutable.ArrayBuffer[Double]()
    var bi = 0
    var remaining = spec(bi)._2
    stack.foreach { bl =>
      var w = bl.w
      while (w > 0) {
        val take = math.min(w, remaining)
        if (take == remaining) {
          perBucket += bl.y.toDouble / bl.w
          bi += 1
          if (bi < spec.length) remaining = spec(bi)._2
        } else remaining -= take.toInt
        w -= take
      }
    }
    val f = fit(8, spec)
    spec.indices.foreach { b =>
      val want = BigDecimal(perBucket(b)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(f(b.toLong) == want, s"bucket $b: ${f(b.toLong)} != $want")
    }
    // and monotone
    val vals = spec.indices.map(b => f(b.toLong))
    assert(vals == vals.sorted)
  }

  // --- applyFit: the serving half ---

  private def applied(B: Int, trainSpec: Seq[(Int, Int, Int)],
                      scores: Seq[Double]): Map[Double, Double] = {
    val f = Isotonic.calibrate(mkRows(B, trainSpec).toDF("score", "label"),
      "score", "label", B)
    Isotonic.applyFit(scores.toDF("score"), "score", f, B)
      .collect()
      .map(r => r.getAs[Double]("score") -> r.getAs[Double]("calibrated"))
      .toMap
  }

  test("applyFit: observed buckets take their fitted step") {
    val got = applied(4,
      Seq((0, 10, 1), (1, 10, 3), (2, 10, 2), (3, 10, 4)),
      Seq(0.1, 0.3, 0.6, 0.9))
    assert(got(0.1) == 0.1 && got(0.3) == 0.25 &&
      got(0.6) == 0.25 && got(0.9) == 0.4)
  }

  test("applyFit: gap buckets take the PREVIOUS step (step semantics)") {
    // buckets 0 and 3 of 4 observed; 1 and 2 are gaps
    val got = applied(4, Seq((0, 10, 2), (3, 10, 8)),
      Seq(0.3, 0.6)) // land in gap buckets 1, 2
    assert(got(0.3) == 0.2 && got(0.6) == 0.2)
  }

  test("applyFit: below-range scores clamp to the first step") {
    // only buckets 2 and 3 of 4 observed
    val got = applied(4, Seq((2, 10, 2), (3, 10, 8)), Seq(0.05, 0.3))
    assert(got(0.05) == 0.2 && got(0.3) == 0.2)
  }

  test("applyFit: score 1.0 clamps into the last bucket") {
    val got = applied(4, Seq((0, 10, 2), (3, 10, 8)), Seq(1.0))
    assert(got(1.0) == 0.8)
  }
}
