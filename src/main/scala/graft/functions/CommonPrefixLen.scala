package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `common_prefix_len(a, b)`: length of the longest common prefix of
  * two strings, in CODE POINTS — the LCP kernel for suffix-array
  * post-processing ([[graft.text.SuffixArray]] → LCP between
  * rank-adjacent suffixes, the Lee et al. 2021 repeated-substring
  * mining step; see `queries/DedupQueries.q216`).
  *
  * Code points (not UTF-16 code units) keep the count aligned with
  * `substring`/`substr` position arithmetic in both Spark and the
  * DuckDB oracle, so `substr(s, 1, common_prefix_len(a, b))` is
  * exactly the shared prefix on any text. A Catalyst expression (not
  * a UDF) so the pair scan stays inside whole-stage codegen — the
  * [[JaroWinkler]] discipline.
  */
case class CommonPrefixLenExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "common_prefix_len"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixLen.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CommonPrefixLen.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLenExpr =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLen {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[CommonPrefixLenExpr].getName, "common_prefix_len")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "common_prefix_len(s1, s2)")
    CommonPrefixLenExpr(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "common_prefix_len", builder, "built-in")

  def compute(ua: UTF8String, ub: UTF8String): Int =
    computeStr(ua.toString, ub.toString)

  /** JVM twin on Strings for partition-scan callers
    * ([[graft.text.SuffixArray.prefixRuns]]) — same arithmetic, same
    * code-point counting. */
  def computeStr(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0 // UTF-16 index
    var cp = 0 // code-point count
    while (i < n) {
      val ca = a.codePointAt(i)
      if (i >= b.length || b.codePointAt(i) != ca) return cp
      val w = Character.charCount(ca)
      // a supplementary pair straddling the min length cannot match
      if (i + w > n) return cp
      i += w
      cp += 1
    }
    cp
  }
}
