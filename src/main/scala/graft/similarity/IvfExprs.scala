package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native IVF kernels — the three per-row computations of [[Ivf]] as
  * plain array loops instead of compositional `aggregate(zip_with)`
  * folds over centroid literals.
  *
  * Two measured traps motivate these (the [[PqEncode]]/[[PqLloydPairs]]
  * story replayed for IVF):
  *  - the fold spelling evaluates its lambdas INTERPRETED, per element,
  *    per centroid — nLists × dim lambda frames per row;
  *  - in the Lloyd pass, Catalyst collapses the `__cell` projection
  *    through the `posexplode`, re-evaluating the full assignment once
  *    per exploded row — a dim× multiplier on top.
  *
  * Distance semantics replicate the fold bit-for-bit so trained
  * centroids (and the q48/q188 oracles) are unchanged: d_i =
  * (double(x_i) − c_i)², accumulated left-to-right from 0.0 in index
  * order — the same IEEE operation sequence as
  * `aggregate(zip_with(vec, cents, ...), 0.0, _+_)`. Argmin keeps the
  * LOWEST index on ties (strict-less replacement), matching the
  * `when(b.d < a.d, b)` reduce. */
abstract class IvfKernel extends Expression with CodegenFallback {
  def vec: Expression
  def flatCents: Expression
  def nListsExpr: Expression

  override def children: Seq[Expression] = Seq(vec, flatCents, nListsExpr)
  override def nullable: Boolean = vec.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vec.dataType.isInstanceOf[ArrayType])
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array vector")
    else if (!flatCents.foldable || !nListsExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName centroids/nLists must be literals")
    else TypeCheckResult.TypeCheckSuccess

  @transient protected lazy val nLists: Int =
    nListsExpr.eval().asInstanceOf[Number].intValue()
  @transient protected lazy val flat: Array[Double] =
    flatCents.eval().asInstanceOf[ArrayData].toDoubleArray()
  @transient protected lazy val dim: Int = flat.length / nLists
  @transient private lazy val elemIsDouble: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  protected def elem(arr: ArrayData, i: Int): Double =
    if (elemIsDouble) arr.getDouble(i) else arr.getFloat(i).toDouble

  /** Σ (x_i − c_i)² for cell c, left-to-right from 0.0. */
  protected def dist2(arr: ArrayData, c: Int): Double = {
    val base = c * dim
    var acc = 0.0
    var i = 0
    while (i < dim) {
      val d = elem(arr, i) - flat(base + i)
      acc = acc + d * d
      i += 1
    }
    acc
  }

  protected def argmin(arr: ArrayData): Int = {
    var bestD = Double.PositiveInfinity
    var bestC = 0
    var c = 0
    while (c < nLists) {
      val d = dist2(arr, c)
      if (d < bestD) { bestD = d; bestC = c }
      c += 1
    }
    bestC
  }
}

/** `ivf_cell_dists(vec, flat_cents, nLists)` → array<double> of the
  * squared L2 distance to every centroid (for probe ranking). */
case class IvfCellDists(vec: Expression, flatCents: Expression,
                        nListsExpr: Expression) extends IvfKernel {
  override def prettyName: String = "ivf_cell_dists"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Double](nLists)
    var c = 0
    while (c < nLists) { out(c) = dist2(arr, c); c += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IvfCellDists =
    copy(vec = newChildren(0), flatCents = newChildren(1),
      nListsExpr = newChildren(2))
}

/** `ivf_cell_assign(vec, flat_cents, nLists)` → int index of the
  * nearest centroid (lowest index on ties). */
case class IvfCellAssign(vec: Expression, flatCents: Expression,
                         nListsExpr: Expression) extends IvfKernel {
  override def prettyName: String = "ivf_cell_assign"
  override def dataType: DataType = IntegerType

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    argmin(v.asInstanceOf[ArrayData])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IvfCellAssign =
    copy(vec = newChildren(0), flatCents = newChildren(1),
      nListsExpr = newChildren(2))
}

/** `ivf_lloyd_pairs(vec, flat_cents, nLists)` → array<struct<cell:int,
  * i:int, e:long>>: the row's Lloyd-update contribution — for each dim
  * index, the scaled-long element ([[Knn.scaledVec]] semantics:
  * floor(x·10⁷ + 0.5)) tagged with the row's assigned cell. Evaluated
  * once per row as the generator input, so the assignment can't be
  * collapse-duplicated per exploded row. */
case class IvfLloydPairs(vec: Expression, flatCents: Expression,
                         nListsExpr: Expression) extends IvfKernel {
  override def prettyName: String = "ivf_lloyd_pairs"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("i", IntegerType, nullable = false),
    StructField("e", LongType, nullable = false))), containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val cell = argmin(arr)
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val e = math.floor(elem(arr, i) * Knn.Scale + 0.5).toLong
      out(i) = new GenericInternalRow(Array[Any](cell, i, e))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IvfLloydPairs =
    copy(vec = newChildren(0), flatCents = newChildren(1),
      nListsExpr = newChildren(2))
}

object IvfExprs {
  private def asLit(e: Expression): Expression = e match {
    case l: Literal => l
    case other => Literal.create(other.eval(), other.dataType)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("ivf_cell_dists", es => {
      require(es.length == 3, "ivf_cell_dists(vec, flat_cents, nLists)")
      IvfCellDists(es.head, asLit(es(1)), asLit(es(2)))
    }, "built-in")
    reg.createOrReplaceTempFunction("ivf_cell_assign", es => {
      require(es.length == 3, "ivf_cell_assign(vec, flat_cents, nLists)")
      IvfCellAssign(es.head, asLit(es(1)), asLit(es(2)))
    }, "built-in")
    reg.createOrReplaceTempFunction("ivf_lloyd_pairs", es => {
      require(es.length == 3, "ivf_lloyd_pairs(vec, flat_cents, nLists)")
      IvfLloydPairs(es.head, asLit(es(1)), asLit(es(2)))
    }, "built-in")
  }
}
