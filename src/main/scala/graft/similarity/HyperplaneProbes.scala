package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `hyperplane_probes(vec, flat_signs, numPlanes, numTables, nProbes)`:
  * the QUERY-side bucket set for multi-probe LSH (Lu et al., VLDB'07) —
  * per table, the base bucket plus the `nProbes` single-bit
  * perturbations whose hyperplane projections sit closest to the
  * decision boundary (smallest |proj|, ties by plane index). Output is
  * array<struct<t:int, bucket:long>> of length numTables×(1+nProbes).
  *
  * Multi-probe trades probe count for table count: the corpus is
  * bucketed ONCE per table (storage ∝ numTables), and recall is bought
  * back at query time by also visiting the near-miss buckets — the
  * right trade at 100 TB, where each extra table re-materializes the
  * full corpus index but extra probes only widen a bucket-local join.
  *
  * Projections replicate [[HyperplaneTables]] bit-for-bit (same
  * left-to-right double fold over the same md5-derived ±1 signs), so a
  * SQL oracle re-deriving proj per (t, p) ranks and flips the exact
  * same bits. Single-bit flips are pairwise distinct and distinct from
  * the base bucket, so the output carries no duplicates within a table.
  */
case class HyperplaneProbes(vec: Expression, flatSigns: Expression,
                            numPlanesExpr: Expression, numTablesExpr: Expression,
                            nProbesExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(vec, flatSigns, numPlanesExpr, numTablesExpr, nProbesExpr)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "hyperplane_probes"

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
      if flatSigns.foldable && numPlanesExpr.foldable &&
        numTablesExpr.foldable && nProbesExpr.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, signs literal, int, int, int)")
  }

  @transient private lazy val planes: Int =
    numPlanesExpr.eval().asInstanceOf[Number].intValue()
  @transient private lazy val tables: Int =
    numTablesExpr.eval().asInstanceOf[Number].intValue()
  @transient private lazy val nProbes: Int = {
    val n = nProbesExpr.eval().asInstanceOf[Number].intValue()
    require(n >= 0 && n <= planes,
      s"$prettyName: nProbes must be in [0, numPlanes], got $n for $planes planes")
    n
  }
  @transient private lazy val signs: Array[Double] =
    flatSigns.eval().asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val dim: Int = signs.length / (planes * tables)
  @transient private lazy val elemIsDouble: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Any](tables * (1 + nProbes))
    val proj = new Array[Double](planes)
    val order = new Array[Int](planes)
    var t = 0
    var o = 0
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
        proj(p) = acc
        if (acc > 0) bucket += (1L << p)
        order(p) = p
        p += 1
      }
      out(o) = new GenericInternalRow(Array[Any](t, bucket)); o += 1
      // insertion sort on (|proj|, p): planes is small (≤16 in practice)
      var a = 1
      while (a < planes) {
        val key = order(a)
        val kAbs = math.abs(proj(key))
        var b = a - 1
        while (b >= 0 && (math.abs(proj(order(b))) > kAbs ||
            (math.abs(proj(order(b))) == kAbs && order(b) > key))) {
          order(b + 1) = order(b); b -= 1
        }
        order(b + 1) = key
        a += 1
      }
      var r = 0
      while (r < nProbes) {
        out(o) = new GenericInternalRow(Array[Any](t, bucket ^ (1L << order(r))))
        o += 1; r += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HyperplaneProbes =
    copy(vec = newChildren(0), flatSigns = newChildren(1),
      numPlanesExpr = newChildren(2), numTablesExpr = newChildren(3),
      nProbesExpr = newChildren(4))
}

object HyperplaneProbes {
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 5,
      "hyperplane_probes(vec, flat_signs, numPlanes, numTables, nProbes)")
    def asLit(e: Expression): Expression = e match {
      case l: Literal => l
      case other => Literal.create(other.eval(), other.dataType)
    }
    HyperplaneProbes(exprs.head, asLit(exprs(1)), asLit(exprs(2)),
      asLit(exprs(3)), asLit(exprs(4)))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_probes", builder, "built-in")
}
