package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_len(text)`: DEFLATE-compressed byte length of a string's
  * UTF-8 bytes (raw DEFLATE — `Deflater(6, nowrap=true)`, i.e. no
  * zlib header/adler32 framing, ~6 bytes under framed zlib output;
  * level 6 is zlib's default) — the classic compression-ratio quality
  * signal: `deflate_len(text) / octet_length(text)` near 0 flags
  * templated/repetitive spam, near (or above) 1 flags high-entropy
  * noise (base64 blobs, minified code), and natural prose sits in
  * between. Used by web-corpus curation as a cheap single-pass
  * repetitiveness detector that catches long-range structure the
  * n-gram repetition stats (q96) cannot (their windows are bounded;
  * LZ77's is 32 KB).
  *
  * A native unary expression: codegen emits one static call around the
  * deflater, so the column stays inside whole-stage codegen and the
  * cost is the compression itself. Deterministic for a given zlib
  * (level fixed, one-shot stream); zlib output is VERSION-stable in
  * practice but not specified, so the driver gate for queries built on
  * it is rows-only + property spec, not a cross-engine hash — the
  * same class of seam as the multimodal decoder.
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression {

  // AbstractDataType (and ImplicitCastInputTypes) is private[sql];
  // input typing is checked manually, matching the repo's other
  // native expressions.
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateLen.deflatedLen($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  /** One-shot raw DEFLATE at level 6; returns the compressed byte
    * count. Called from generated code — keep the signature
    * (UTF8String) → long. */
  def deflatedLen(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = new Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "deflate_len(text)")
    DeflateLen(exprs.head)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate_len", builder, "built-in")
}
