package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `pq_lut(scaled_vec, flat_books, m, ksub)`: a query vector's full
  * ADC lookup table — the m × ksub matrix of exact int64 squared
  * distances from each subspace slice to every centroid, as
  * array<array<long>>. [[AdcDistance]] then scores a corpus row as
  * Σⱼ lut(j)(codes(j)).
  *
  * One native expression in place of the compositional spelling
  * (m·ksub separate `aggregate(zip_with(slice(...)))` folds): beyond
  * the interpreted-lambda tax ([[PqEncode]]'s measured ~800×), the
  * compositional form IS a 256-term expression tree at m=ksub=16,
  * which Catalyst must analyze/optimize/fold per plan — seconds of
  * driver time before a single row moves. `CodegenFallback` is fine:
  * the per-row work is the arithmetic itself, and the LUT projection
  * runs once per QUERY row (the broadcast side), never per pair. */
case class PqLut(vec: Expression, flatBooks: Expression,
                 mExpr: Expression, ksubExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, flatBooks, mExpr, ksubExpr)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vec.dataType.isInstanceOf[ArrayType] ||
      vec.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<long> input")
    else if (!flatBooks.foldable || !mExpr.foldable || !ksubExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName codebooks/dims must be literals")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val m: Int = mExpr.eval().asInstanceOf[Number].intValue()
  @transient private lazy val ksub: Int = ksubExpr.eval().asInstanceOf[Number].intValue()
  @transient private lazy val flat: Array[Long] =
    flatBooks.eval().asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val dsub: Int = flat.length / (m * ksub)

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val ds = new Array[Long](ksub)
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var d = 0L
        var t = 0
        while (t < dsub) {
          val x = arr.getLong(j * dsub + t) - flat(base + t)
          d += x * x
          t += 1
        }
        ds(c) = d
        c += 1
      }
      rows(j) = new GenericArrayData(ds)
      j += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqLut =
    copy(vec = newChildren(0), flatBooks = newChildren(1),
      mExpr = newChildren(2), ksubExpr = newChildren(3))
}

object PqLut {
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4, "pq_lut(vec, flat_books, m, ksub)")
    def asLit(e: Expression): Expression = e match {
      case l: Literal => l
      case other => Literal.create(other.eval(), other.dataType)
    }
    PqLut(exprs.head, asLit(exprs(1)), asLit(exprs(2)), asLit(exprs(3)))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_lut", builder, "built-in")
}
