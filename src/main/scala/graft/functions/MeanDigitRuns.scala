package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native mean-of-digit-runs: the reference's length-class name parser
  * `mean(as.numeric(str_extract_all(x, "[0-9]+")))`
  * (`/root/reference/R/pt_nest_species.R:68-70`) as a single compiled
  * byte scan.
  *
  * The composed form (`regexp_extract_all` + lambda `aggregate`) routes
  * through higher-order functions, which are CodegenFallback — every row
  * pays interpreted eval, array allocation and boxing. This expression
  * emits one static call inside whole-stage codegen and allocates
  * nothing: UTF-8 multi-byte sequences never contain 0x30–0x39, so a
  * plain byte scan finds exactly the `[0-9]+` runs.
  *
  * Returns null for null input or when the string has no digits (the
  * mean of an empty set), matching the composed form.
  */
case class MeanDigitRuns(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "mean_digit_runs"

  override protected def nullSafeEval(s: Any): Any = {
    val r = MeanDigitRuns.compute(s.asInstanceOf[UTF8String])
    if (java.lang.Double.isNaN(r)) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // NaN is the no-digits sentinel: a long-sum/long-count quotient is
      // otherwise never NaN
      s"""
         |double ${ev.value}_r = graft.functions.MeanDigitRuns.compute($c);
         |if (Double.isNaN(${ev.value}_r)) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MeanDigitRuns =
    copy(child = newChild)
}

object MeanDigitRuns {
  /** Mean of all maximal ASCII-digit runs, NaN when none. Runs of ≤18
    * digits accumulate exactly in a long (the composed regexp form's
    * arithmetic); longer runs — where a long would silently wrap — and
    * long-sum overflow degrade to double accumulation instead. */
  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    var i = 0
    var sumL = 0L
    var sumD = 0.0
    var exact = true
    var runs = 0L
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= '0' && b <= '9') {
        var v = 0L
        var vd = 0.0
        var digits = 0
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
          val d = bytes(i) - '0'
          if (digits < 18) v = v * 10L + d
          vd = vd * 10.0 + d
          digits += 1
          i += 1
        }
        if (digits <= 18 && exact) {
          try sumL = Math.addExact(sumL, v)
          catch { case _: ArithmeticException => exact = false }
        } else exact = false
        sumD += (if (digits <= 18) v.toDouble else vd)
        runs += 1L
      } else i += 1
    }
    if (runs == 0L) Double.NaN
    else if (exact) sumL.toDouble / runs.toDouble
    else sumD / runs.toDouble
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MeanDigitRuns].getName, "mean_digit_runs")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "mean_digit_runs(str)")
    val e = exprs.head
    MeanDigitRuns(if (e.dataType == StringType) e else Cast(e, StringType))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mean_digit_runs", builder, "built-in")
}
