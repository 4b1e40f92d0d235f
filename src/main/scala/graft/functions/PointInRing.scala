package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType}

/** Native point-in-polygon (even-odd ray casting) — the reference
  * assigns GPS points to named zones with `sf::st_within`
  * (`/root/reference/R/ingest-pds-data.R:742-747`). Re-expressed as a
  * whole-stage-codegen scalar so the zone assignment is a plain
  * projection over the track table: no geometry library, no UDF boxing,
  * and the polygon literal folds into the generated code's closure.
  *
  * `point_in_ring(x, y, ring)` — `ring` is a flattened
  * `array<double>` of [x0,y0, x1,y1, …] vertices of a simple (non-
  * self-intersecting) closed ring; the closing edge last→first is
  * implicit. Interior points return true; points exactly ON an edge are
  * classification-undefined (match `st_within`'s strict interior by
  * keeping data off boundaries). Multi-ring polygons with holes compose:
  * `point_in_ring(outer) AND NOT point_in_ring(hole)`.
  */
case class PointInRing(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == DoubleType && second.dataType == DoubleType &&
      (third.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double, array<double>), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = BooleanType
  // nullable even when every input is: malformed rings yield null, and
  // inheriting children-based nullability would make codegen hard-wire
  // the result as non-null and silently drop that null
  override def nullable: Boolean = true
  override def prettyName: String = "point_in_ring"

  override protected def nullSafeEval(x: Any, y: Any, ring: Any): Any = {
    val r = PointInRing.containsCoded(
      x.asInstanceOf[Double], y.asInstanceOf[Double], ring.asInstanceOf[ArrayData])
    if (r < 0) null else r == 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, r) =>
      s"""
         |byte ${ev.value}_r = graft.functions.PointInRing.containsCoded($x, $y, $r);
         |if (${ev.value}_r < 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r == 1; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PointInRing =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PointInRing {
  /** Even-odd crossing count over the implicit closed ring.
    * Returns 1 = inside, 0 = outside, -1 = malformed ring (odd length,
    * fewer than 3 vertices, or a null vertex — the SQL result is null
    * rather than a classification against garbage coordinates). */
  def containsCoded(x: Double, y: Double, ring: ArrayData): Byte = {
    val m = ring.numElements()
    if (m < 6 || m % 2 != 0) return -1
    var i = 0
    while (i < m) { if (ring.isNullAt(i)) return -1; i += 1 }
    val n = m / 2
    var inside = false
    var j = n - 1
    i = 0
    while (i < n) {
      val xi = ring.getDouble(2 * i); val yi = ring.getDouble(2 * i + 1)
      val xj = ring.getDouble(2 * j); val yj = ring.getDouble(2 * j + 1)
      if ((yi > y) != (yj > y) &&
          x < (xj - xi) * (y - yi) / (yj - yi) + xi) inside = !inside
      j = i
      i += 1
    }
    if (inside) 1 else 0
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PointInRing].getName, "point_in_ring")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "point_in_ring(x, y, ring)")
    def d(e: Expression): Expression =
      if (e.dataType == DoubleType) e else Cast(e, DoubleType)
    val ring = exprs(2).dataType match {
      case ArrayType(DoubleType, _) => exprs(2)
      case _ => Cast(exprs(2), ArrayType(DoubleType))
    }
    PointInRing(d(exprs(0)), d(exprs(1)), ring)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "point_in_ring", builder, "built-in")
}
