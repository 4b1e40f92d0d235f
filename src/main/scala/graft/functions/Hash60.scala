package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hash60(key, prefix)`: the repo-standard replayable 60-bit hash —
  * the value of `conv(substr(md5(prefix || key), 1, 15), 16, 10)` —
  * as ONE native kernel instead of a four-expression string pipeline.
  *
  * The compositional spelling materializes, per row: a concatenated
  * UTF8String, a 32-char hex string from `md5`, a 15-char substring,
  * and a base-16 `conv` parse. Profiling k columns of a 100 TB table
  * pays that k times per row and it dominates the whole profile scan
  * (q245's constant). Here the digest runs straight off the key bytes
  * and the first 15 hex nibbles are the top 60 bits of the first 8
  * digest bytes — `(bigEndianLong(d[0..8]) >>> 4)` — so no
  * intermediate string ever exists. Bit-identical to the
  * compositional spelling (Hash60Spec pins it; the DuckDB oracles
  * keep replaying the md5 spelling in SQL) and to
  * [[HllSketch.hash60Jvm]], the state-store twin.
  *
  * A Catalyst expression with codegen (the [[JaroWinkler]] /
  * [[CommonPrefixLen]] discipline) so profile scans stay inside
  * whole-stage codegen; the `MessageDigest` instance is thread-local
  * (JDK digests are stateful and not shareable across tasks). */
case class Hash60Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string key")
    else if (right.dataType != StringType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string literal prefix")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override protected def nullSafeEval(key: Any, prefix: Any): Any =
    Hash60.compute(key.asInstanceOf[UTF8String],
      prefix.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, p) =>
      s"${ev.value} = graft.functions.Hash60.compute($k, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hash60Expr =
    copy(left = newLeft, right = newRight)
}

object Hash60 {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[Hash60Expr].getName, "hash60")

  private val localMd = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 15 hex nibbles of md5(prefix ‖ key) as a nonneg long: the
    * top 60 bits of the first 8 digest bytes, big-endian. */
  def compute(key: UTF8String, prefix: UTF8String): Long = {
    val md = localMd.get()
    md.reset()
    md.update(prefix.getBytes)
    md.update(key.getBytes)
    val d = md.digest()
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "hash60(key, prefix)")
    val pE = exprs(1) match {
      case l: Literal => l
      case other => Literal(other.eval(), other.dataType)
    }
    Hash60Expr(exprs.head, pE)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash60", builder, "built-in")
}
