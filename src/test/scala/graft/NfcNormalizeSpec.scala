package graft

import graft.functions.NfcNormalize
import org.apache.spark.sql.functions._

/** All non-ASCII content is written with explicit \u escapes so the
  * decomposed/precomposed distinction survives any editor or tool that
  * normalizes source files. */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  NfcNormalize.register(spark)

  private val composedE = "Caf\u00e9"
  private val decomposedE = "Cafe\u0301"

  private def nfc(rows: Seq[String]) =
    rows.toDF("t").select(call_function("unicode_nfc", $"t").as("n"))
      .as[String].collect().toSeq

  test("composes combining sequences to precomposed forms") {
    assert(decomposedE.length == 5 && composedE.length == 4, "fixture sanity")
    assert(nfc(Seq(decomposedE, "nai\u0308ve")) == Seq(composedE, "na\u00efve"))
  }

  test("idempotent and identity on ASCII / already-NFC input") {
    val inputs = Seq("plain ascii", composedE, "", "\u00e9\u00e9\u00e9")
    assert(nfc(inputs) == inputs)
    assert(nfc(nfc(Seq(decomposedE))) == nfc(Seq(decomposedE)))
  }

  test("null passes through; expression stays inside whole-stage codegen") {
    val df = Seq(Some(decomposedE), None).toDF("t")
      .select(call_function("unicode_nfc", $"t").as("n"))
    assert(df.as[Option[String]].collect().toSet == Set(Some(composedE), None))
    // literal frames constant-fold to a LocalTableScan, so assert the
    // codegen span over a real scan: the projection must not fall back
    // to an interpreted Project
    val scanned = graft.core.Tables.documents(spark, sf)
      .select(call_function("unicode_nfc", $"text").as("n"))
    val plan = scanned.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen span in plan toString
    assert(plan.contains("*(1) Project [unicode_nfc"), s"expected codegen:\n$plan")
  }

  test("normalization unifies dedup fingerprints across spellings") {
    val df = Seq((1L, composedE + " menu"), (2L, decomposedE + " menu")).toDF("id", "t")
    val raw = df.select(md5($"t").as("k")).as[String].collect().toSet
    val keys = df.select(md5(call_function("unicode_nfc", $"t")).as("k"))
      .as[String].collect().toSet
    assert(raw.size == 2, "distinct spellings hash apart before NFC")
    assert(keys.size == 1, "same text, one fingerprint after NFC")
  }
}
