package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Weights

/** calculate_weights composition (`R/calculate-weights.R:452-569`):
  * coefficient-table build semantics and the relational estimate's
  * guard/candidate/quantile behavior on hand-computable fixtures. */
class WeightsSpec extends SparkSpec {
  import spark.implicits._

  // raw morphometric fixture: columns as the reference's rfish table
  private def rawFixture = Seq(
    // code A: one TL row with an extra aTL coefficient (→ 2 lw rows),
    // plus an ll row FL→TL so FL lengths can transform to TL
    ("A", "sp1", 0.0, 100.0, "TL", Some(0.01), Some(0.02), 3.0, Some("no"),
      Some("TL"), Some("FL"), Some(2.0), Some(2.0)),
    // code A, quality-flagged → dropped from lw (EsQ yes)
    ("A", "sp2", 0.0, 100.0, "TL", Some(0.5), None, 3.0, Some("yes"),
      None, None, None, None),
    // code A, null EsQ → KEPT (R's isTRUE(NA == "yes") is FALSE)
    ("A", "sp3", 0.0, 100.0, "FL", Some(0.04), None, 2.0, None,
      None, None, None, None),
    // code A: an FL coefficient row for sp1, so the reciprocal
    // TL→FL-transformed candidate below finds a weight
    ("A", "sp1", 0.0, 100.0, "FL", Some(0.04), None, 2.0, Some("no"),
      None, None, None, None),
    // code B: plain row, no ll
    ("B", "sp4", 0.0, 100.0, "TL", Some(0.03), None, 2.0, Some("no"),
      None, None, None, None))
    .toDF("interagency_code", "Species", "LengthMin", "LengthMax", "Type",
      "a", "aTL", "b", "EsQ", "Length1", "Length2", "aL", "bL")

  private def emptyManual = Seq.empty[(String, String, Double, Double, String, Double, Double, String)]
    .toDF("interagency_code", "Species", "LengthMin", "LengthMax", "Type", "a", "b", "EsQ")

  test("morphometricTables: aTL augmentation, EsQ filter (null passes), distinct") {
    val (lw, _) = Weights.morphometricTables(rawFixture, emptyManual)
    val rows = lw.select("interagency_code", "Species", "Type", "a")
      .as[(String, String, String, Double)].collect().toSet
    // sp1 contributes its original TL row AND the aTL variant
    assert(rows.contains(("A", "sp1", "TL", 0.01)))
    assert(rows.contains(("A", "sp1", "TL", 0.02)))
    // sp2 (EsQ yes) dropped; sp3 (EsQ null) kept; B kept
    assert(!rows.exists(_._2 == "sp2"))
    assert(rows.contains(("A", "sp3", "FL", 0.04)))
    assert(rows.contains(("A", "sp1", "FL", 0.04)))
    assert(rows.contains(("B", "sp4", "TL", 0.03)))
    assert(rows.size == 5)
  }

  test("morphometricTables: reciprocal length-length augmentation") {
    val (_, ll) = Weights.morphometricTables(rawFixture, emptyManual)
    val rows = ll.select("interagency_code", "Length1", "Length2", "aL", "bL")
      .as[(String, String, String, Double, Double)].collect().toSet
    // original: TL→FL with (aL=2, bL=2); reciprocal: FL→TL with
    // (aL' = −2/2 = −1, bL' = 1/2)
    assert(rows == Set(
      ("A", "TL", "FL", 2.0, 2.0),
      ("A", "FL", "TL", -1.0, 0.5)))
  }

  test("estimateWeights: guards, candidates, taxon quantile") {
    val (lw, ll) = Weights.morphometricTables(rawFixture, emptyManual)
    val catchRows = Seq(
      // TL length 10 on code A: direct candidates over species {sp1, sp3}
      // at Type=TL → lw matches sp1's two TL rows (w = 0.01·10³ = 10 and
      // 0.02·10³ = 20). The RECIPROCAL ll row (FL→TL inverted to TL→FL:
      // aL=−1, bL=0.5) transforms the length at the ll row's own species
      // (as the reference's this_ll does): len' = −1 + 10·0.5 = 4 at
      // (sp1, FL) → w = 0.04·4² = 0.64. Weights {0.64, 10, 20}; type-7
      // q0.9 → rank 1.8 → 10 + 0.8·10 = 18; ×n=2 → 36
      (1L, "A", 10.0, "TL", 2.0),
      // n_individuals = 0 → exactly 0.0
      (2L, "A", 10.0, "TL", 0.0),
      // code "0" → null
      (3L, "0", 10.0, "TL", 5.0),
      // null length → null
      (4L, "A", Double.NaN, "TL", 5.0),
      // code with no lw/ll rows at the observed type: B at FL has no
      // FL lw row and no ll transform → no candidates → null
      (5L, "B", 10.0, "FL", 5.0))
      .toDF("rid", "code", "length", "length_type", "n_individuals")
      .withColumn("length",
        when(isnan(col("length")), lit(null).cast("double")).otherwise(col("length")))
    val est = Weights.estimateWeights(catchRows, lw, ll,
      quantiles = Map.empty, defaultQ = 0.9)
      .select("rid", "weight_est").as[(Long, Option[Double])]
      .collect().toMap
    assert(math.abs(est(1L).get - 36.0) < 1e-9)
    assert(est(2L).contains(0.0))
    assert(est(3L).isEmpty)
    assert(est(4L).isEmpty)
    assert(est(5L).isEmpty)
  }

  test("estimateWeights: per-taxon quantile selection routes codes to levels") {
    // two codes, same three candidate weights {1, 2, 3} via three
    // same-type lw rows; qA=0.5 → 2.0, default 0.9 → 2.8
    val lw = Seq(
      ("A", "s1", "TL", 1.0, 0.0), ("A", "s2", "TL", 2.0, 0.0), ("A", "s3", "TL", 3.0, 0.0),
      ("B", "s1", "TL", 1.0, 0.0), ("B", "s2", "TL", 2.0, 0.0), ("B", "s3", "TL", 3.0, 0.0))
      .toDF("interagency_code", "Species", "Type", "a", "b")
    val ll = Seq.empty[(String, String, String, String, Double, Double)]
      .toDF("interagency_code", "Species", "Length1", "Length2", "aL", "bL")
    val catchRows = Seq(("A", 1L), ("B", 2L)).toDF("code", "rid")
      .withColumn("length", lit(5.0))
      .withColumn("length_type", lit("TL"))
      .withColumn("n_individuals", lit(1.0))
    val est = Weights.estimateWeights(catchRows, lw, ll,
      quantiles = Map("A" -> 0.5), defaultQ = 0.9)
      .select("rid", "weight_est").as[(Long, Double)].collect().toMap
    // a·L^0 = a, so candidate weights are exactly {1, 2, 3}
    assert(math.abs(est(1L) - 2.0) < 1e-12)   // median for A
    assert(math.abs(est(2L) - 2.8) < 1e-12)   // type-7 0.9 for default
  }
}
