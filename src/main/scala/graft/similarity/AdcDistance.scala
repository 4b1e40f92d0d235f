package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `adc_distance(lut, codes)`: the asymmetric-distance lookup-sum of a
  * PQ-coded corpus row against a query's per-subspace distance table —
  * Σⱼ lut(j)(codes(j)) as one int64 loop.
  *
  * `lut` is array<array<long>> (m × ksub subspace distances, computed
  * once per query row), `codes` is array<int> (the corpus row's PQ
  * codes). This is the per-PAIR hot path of [[Pq.adcTopK]] /
  * [[Pq.ivfAdcTopK]] — evaluated |corpus|×|queries| (or cell-pruned)
  * times — so it must be native: the compositional form
  * `aggregate(zip_with(lut, codes, element_at))` runs its lambdas
  * interpreted per element, the same ~800× trap class measured on the
  * encode side ([[PqEncode]], 247 s → 2.7 s at sf0.1).
  *
  * Full codegen (not CodegenFallback): the expression sits inside the
  * scored-pairs projection between a join and a window sort, so
  * staying in whole-stage codegen keeps the scan fused.
  *
  * Producer contract (same as Spark's own array kernels over unsafe
  * data): `lut` rows and `codes` elements must be non-null and every
  * code in [0, ksub) — [[Pq.lutCol]]/[[Pq.encodeCol]] guarantee both;
  * out-of-contract input reads an undefined (not unsafe) value, it
  * does not throw.
  */
case class AdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "adc_distance"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(LongType, _), _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<array<long>>, array<int>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(lutAny: Any, codesAny: Any): Any = {
    val lut = lutAny.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0L
    var j = 0
    while (j < m) {
      acc += lut.getArray(j).getLong(codes.getInt(j))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      s"""
         |final int $m = $codes.numElements();
         |long ${ev.value}Acc = 0L;
         |for (int $j = 0; $j < $m; $j++) {
         |  ${ev.value}Acc += $lut.getArray($j).getLong($codes.getInt($j));
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDistance =
    copy(left = newLeft, right = newRight)
}

object AdcDistance {
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "adc_distance(lut, codes)")
    AdcDistance(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "adc_distance", builder, "built-in")
}
