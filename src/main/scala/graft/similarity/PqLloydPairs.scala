package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** `pq_lloyd_pairs(scaled_vec, flat_books, m, ksub)`: one row's Lloyd-
  * update contribution as an array of (c, i, e) structs — for each dim
  * index i, the element value e and the row's assigned code c in i's
  * subspace. `explode` + groupBy(c, i) + sum/count is then the whole
  * centroid update, one shuffle of bounded (ksub × dim) groups.
  *
  * Exists because the compositional spelling —
  * `select(pq_encode(sv).as("codes"), posexplode(sv))` followed by a
  * per-exploded-row `element_at(codes, ...)` — gets its lower Project
  * collapsed through the Generate by Catalyst, re-evaluating the FULL
  * encode (and the interpreted scaledVec transform) once per exploded
  * row: dim× redundant work per vector, measured 0.75 s of q186's
  * 1.8 s at sf0.1 and a genuine 64× waste at scale. As the generator
  * INPUT this expression is evaluated exactly once per row, so the
  * plan shape is collapse-proof rather than optimizer-fragile. */
case class PqLloydPairs(vec: Expression, flatBooks: Expression,
                        mExpr: Expression, ksubExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, flatBooks, mExpr, ksubExpr)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("c", IntegerType, nullable = false),
    StructField("i", IntegerType, nullable = false),
    StructField("e", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "pq_lloyd_pairs"

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
    val dim = arr.numElements()
    val out = new Array[Any](dim)
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
      var t = 0
      while (t < dsub) {
        val i = j * dsub + t
        out(i) = new GenericInternalRow(
          Array[Any](bestC, i, arr.getLong(i)))
        t += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqLloydPairs =
    copy(vec = newChildren(0), flatBooks = newChildren(1),
      mExpr = newChildren(2), ksubExpr = newChildren(3))
}

object PqLloydPairs {
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4, "pq_lloyd_pairs(vec, flat_books, m, ksub)")
    def asLit(e: Expression): Expression = e match {
      case l: Literal => l
      case other => Literal.create(other.eval(), other.dataType)
    }
    PqLloydPairs(exprs.head, asLit(exprs(1)), asLit(exprs(2)), asLit(exprs(3)))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_lloyd_pairs", builder, "built-in")
}
