package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `pq_encode(scaled_vec, flat_books, m, ksub)`: the PQ code vector of
  * a scaled-long embedding — per subspace j, the index of the nearest
  * centroid (exact int64 squared distance, ties to the low code).
  * Codebooks arrive as one flat row-major long array literal
  * ([m][ksub][dsub]), parsed once per plan.
  *
  * A single native expression with plain array loops: the equivalent
  * compositional form (m·ksub `aggregate`-over-`slice` folds) runs its
  * lambdas interpreted per element — measured ~800× slower on the
  * encode pass. `CodegenFallback` is fine here: the per-row work IS
  * the arithmetic; there is no expression-tree overhead left to fuse.
  */
case class PqEncode(vec: Expression, flatBooks: Expression,
                    mExpr: Expression, ksubExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, flatBooks, mExpr, ksubExpr)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

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
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestD = Long.MaxValue
      var bestC = 0
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
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqEncode =
    copy(vec = newChildren(0), flatBooks = newChildren(1),
      mExpr = newChildren(2), ksubExpr = newChildren(3))
}

object PqEncode {
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4, "pq_encode(vec, flat_books, m, ksub)")
    def asLit(e: Expression): Expression = e match {
      case l: Literal => l
      case other => Literal.create(other.eval(), other.dataType)
    }
    PqEncode(exprs.head, asLit(exprs(1)), asLit(exprs(2)), asLit(exprs(3)))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode", builder, "built-in")
}
