package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity (Winkler 1990) — the fuzzy-match
  * kernel behind blocked record linkage / entity resolution (the
  * Fellegi–Sunter comparison step): Jaro similarity from the bounded
  * matching window plus the Winkler common-prefix boost (scale 0.1,
  * prefix ≤ 4, applied only above the classic 0.7 threshold —
  * byte-checked against DuckDB's `jaro_winkler_similarity` on the
  * MARTHA/DWAYNE/DIXON reference triples).
  *
  * Spark has no built-in JW (only levenshtein); the composed
  * alternative would be a Scala UDF — this expression stays inside
  * whole-stage codegen as one static call, the
  * [[MeanDigitRuns]]/[[HaversineKm]] discipline. Comparison is by
  * UTF-16 code unit (charAt), which equals code-point comparison for
  * BMP text; the DuckDB byte-equality claim is therefore scoped to
  * BMP/ASCII inputs — supplementary-plane characters (each two code
  * units here, one code point there) may score differently.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  val info: ExpressionInfo = new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "jaro_winkler(s1, s2)")
    JaroWinklerExpr(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", builder, "built-in")

  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return if (la == lb) 1.0 else 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions between the matched sequences
    var half = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) half += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - half / 2.0) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(la, lb))
    while (prefix < maxP && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
