package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `dot_scaled(a, b)`: int64 dot product of two `array<long>` scaled
  * vectors — the inner loop of every embedding operator (brute-force
  * k-NN, LSH/IVF verification, near-dup pairs, bitext mining).
  *
  * A native expression because the composable spelling
  * (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) ALLOCATES an
  * intermediate array per evaluated pair — on an n×m scoring join
  * that's millions of 64-element arrays per task going straight to
  * garbage (measured: the q131 mutual-NN bench fell 8.5 s → 1.2 s at
  * sf0.1 from this change alone). The generated code here is one
  * allocation-free fused loop over the two `ArrayData`.
  *
  * Semantics match the composable spelling exactly: null input → null;
  * mismatched lengths → null (zip_with pads with null, which poisons
  * the sum); any null element → null.
  */
case class DotScaled(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_scaled"
  // a null element nulls the result even when inputs are non-null
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotScaled =
    copy(left = newLeft, right = newRight)
}

object DotScaled {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DotScaled].getName, "dot_scaled")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "dot_scaled(a, b)")
    DotScaled(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_scaled", builder, "built-in")
}
