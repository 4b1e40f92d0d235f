package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `hyperplane_tables(vec, flat_signs, numPlanes, numTables)`: all of
  * a vector's LSH table buckets — array<struct<t:int, bucket:long>> —
  * as ONE native expression, the generator input for
  * [[Knn.hyperplaneBuckets]]'s explode.
  *
  * The compositional spelling evaluates numTables × numPlanes separate
  * `aggregate(zip_with(vec, signs, ...))` folds per row, each an
  * interpreted lambda per element (the [[PqEncode]] trap class — at
  * 4 tables × 6 planes × 64 dims that is ~1.5k interpreted frames per
  * vector across the whole q41/q42/q105/q147 LSH family).
  *
  * Projection semantics replicate the fold bit-for-bit so buckets (and
  * every bucket-replaying oracle) are unchanged: proj = left-to-right
  * double fold of x_i · s_i from 0.0 — the same IEEE operation
  * sequence as `aggregate(zip_with(vec, signs, _*_), 0.0, _+_)` and
  * DuckDB's `list_reduce` — and bucket bit p is set iff proj > 0.
  * `flat_signs` is the [numTables][numPlanes][dim] row-major ±1 matrix
  * ([[Knn.signComponent]]'s md5 parity, computed driver-side). */
case class HyperplaneTables(vec: Expression, flatSigns: Expression,
                            numPlanesExpr: Expression, numTablesExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(vec, flatSigns, numPlanesExpr, numTablesExpr)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "hyperplane_tables"

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
      if flatSigns.foldable && numPlanesExpr.foldable && numTablesExpr.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, signs literal, int, int)")
  }

  @transient private lazy val planes: Int =
    numPlanesExpr.eval().asInstanceOf[Number].intValue()
  @transient private lazy val tables: Int =
    numTablesExpr.eval().asInstanceOf[Number].intValue()
  @transient private lazy val signs: Array[Double] =
    flatSigns.eval().asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val dim: Int = signs.length / (planes * tables)
  @transient private lazy val elemIsDouble: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dim
        var acc = 0.0
        var i = 0
        while (i < dim) {
          val x = if (elemIsDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
          acc = acc + x * signs(base + i)
          i += 1
        }
        if (acc > 0) bucket += (1L << p)
        p += 1
      }
      out(t) = new GenericInternalRow(Array[Any](t, bucket))
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HyperplaneTables =
    copy(vec = newChildren(0), flatSigns = newChildren(1),
      numPlanesExpr = newChildren(2), numTablesExpr = newChildren(3))
}

object HyperplaneTables {
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4,
      "hyperplane_tables(vec, flat_signs, numPlanes, numTables)")
    def asLit(e: Expression): Expression = e match {
      case l: Literal => l
      case other => Literal.create(other.eval(), other.dataType)
    }
    HyperplaneTables(exprs.head, asLit(exprs(1)), asLit(exprs(2)), asLit(exprs(3)))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_tables", builder, "built-in")
}
