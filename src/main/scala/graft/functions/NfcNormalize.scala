package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unicode_nfc(text)`: Unicode NFC normalization — the canonical-
  * composition pass a multilingual corpus needs before ANY
  * equality-based operator (exact dedup, shingling, vocabulary counts):
  * "é" as U+0065 U+0301 and as U+00E9 are different bytes, different
  * md5s, different shingles, yet the same text. Normalizing first makes
  * every downstream hash/join see one spelling.
  *
  * A native expression for the same reason as [[HaversineKm]]: a Scala
  * UDF would box and break whole-stage codegen, while this generates
  * one static call (`java.text.Normalizer`, the JDK's implementation of
  * Unicode normalization — the same algorithm DuckDB's `nfc_normalize`
  * implements, so results are oracle-checkable byte-for-byte). NFC is
  * idempotent; already-normalized ASCII passes through with one
  * quick-check scan and no allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // Normalizer.isNormalized is a cheap quick-check; the common ASCII /
    // already-NFC row allocates nothing
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalize].getName, "unicode_nfc")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "unicode_nfc(text)")
    NfcNormalize(exprs.head)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_nfc", builder, "built-in")
}
