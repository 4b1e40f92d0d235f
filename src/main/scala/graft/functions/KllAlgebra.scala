package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** KLL quantile-sketch STATE algebra — the rollup counterpart to
  * `hll_registers`/`hll_merge` (q222), `cm_merge` (q227) and
  * `kmv_merge` (q228): build a serialized sketch state once at the
  * finest grain, then answer every coarser grain by merging STATES,
  * never rescanning rows. At 100 TB the fine-grain pass is the only
  * full scan; each rollup is a shuffle over sketch-sized rows.
  *
  *  - `kll_state(value, capacity)` — aggregate rows into a serialized
  *    compactor state (binary).
  *  - `kll_merge(state, capacity)` — aggregate serialized states into
  *    one merged state (binary).
  *  - `kll_value(state, p)` — scalar: the R-type-7 quantile estimate
  *    held by a state.
  *  - `kll_n(state)` — scalar: total weight (exact row count while no
  *    compaction has fired).
  *
  * Dynamics live in [[QSketchOps]], shared verbatim with
  * `quantile_sketch` (q113) — merge(state) and update(rows) are THE
  * SAME compaction code, so the merge law "fine states merged ≡ rows
  * aggregated directly" holds exactly in the no-compaction regime
  * (oracle-hashed, q260) and within the KLL rank bound beyond it
  * (property-tested, QuantileSketchSpec). State bytes are
  * arrival-ordered and therefore NOT canonical — grade states only
  * through `kll_value`/`kll_n`, never by comparing bytes. */
case class KllState(child: Expression, capExpr: Expression,
                    override val mutableAggBufferOffset: Int = 0,
                    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QSketchBuffer] {

  private lazy val cap: Int = {
    val c = capExpr.eval().asInstanceOf[Number].intValue()
    if (c % 2 == 0) c else c + 1 // match quantile_sketch's even-cap rule
  }

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_state"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a double column")
    else if (!capExpr.foldable || capExpr.dataType != IntegerType ||
      capExpr.eval() == null || capExpr.eval().asInstanceOf[Number].intValue() < 4)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires an integer literal capacity >= 4")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): QSketchBuffer = new QSketchBuffer()

  override def update(buf: QSketchBuffer, input: InternalRow): QSketchBuffer = {
    val v = child.eval(input)
    if (v != null) QSketchOps.insert(buf, v.asInstanceOf[Double], cap)
    buf
  }

  override def merge(buf: QSketchBuffer, other: QSketchBuffer): QSketchBuffer = {
    QSketchOps.mergeInto(buf, other, cap)
    buf
  }

  override def eval(buf: QSketchBuffer): Any = QSketchOps.serialize(buf)
  override def serialize(buf: QSketchBuffer): Array[Byte] = QSketchOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QSketchBuffer = QSketchOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllState =
    copy(child = newChildren(0), capExpr = newChildren(1))
}

/** Aggregate serialized KLL states into one merged state. The merge's
  * OWN capacity governs compaction: merging under a smaller capacity
  * than the states were built with RE-CAPS them (the KMV re-cap
  * analogue — compaction fires during the merge; estimates then carry
  * the smaller cap's rank bound, property-tested in
  * QuantileSketchSpec). Inputs must be `kll_state`/`kll_merge` outputs
  * — arbitrary bytes fail deserialization by contract. */
case class KllMerge(child: Expression, capExpr: Expression,
                    override val mutableAggBufferOffset: Int = 0,
                    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QSketchBuffer] {

  private lazy val cap: Int = {
    val c = capExpr.eval().asInstanceOf[Number].intValue()
    if (c % 2 == 0) c else c + 1
  }

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a binary kll_state column")
    else if (!capExpr.foldable || capExpr.dataType != IntegerType ||
      capExpr.eval() == null || capExpr.eval().asInstanceOf[Number].intValue() < 4)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires an integer literal capacity >= 4")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): QSketchBuffer = new QSketchBuffer()

  override def update(buf: QSketchBuffer, input: InternalRow): QSketchBuffer = {
    val v = child.eval(input)
    if (v != null)
      QSketchOps.mergeInto(buf, QSketchOps.deserialize(v.asInstanceOf[Array[Byte]]), cap)
    buf
  }

  override def merge(buf: QSketchBuffer, other: QSketchBuffer): QSketchBuffer = {
    QSketchOps.mergeInto(buf, other, cap)
    buf
  }

  override def eval(buf: QSketchBuffer): Any = QSketchOps.serialize(buf)
  override def serialize(buf: QSketchBuffer): Array[Byte] = QSketchOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QSketchBuffer = QSketchOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllMerge =
    copy(child = newChildren(0), capExpr = newChildren(1))
}

/** Scalar: the R-type-7 quantile estimate held by a serialized state. */
case class KllValue(state: Expression, pExpr: Expression)
    extends Expression with CodegenFallback {

  private def asDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }
  @transient private lazy val p: Double = asDouble(pExpr.eval())

  override def children: Seq[Expression] = Seq(state, pExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_value"

  override def checkInputDataTypes(): TypeCheckResult =
    if (state.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a binary kll_state column")
    else if (!pExpr.foldable || pExpr.eval() == null ||
      { val v = asDouble(pExpr.eval()); v < 0.0 || v > 1.0 })
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal p in [0, 1]")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val v = state.eval(input)
    if (v == null) return null
    QSketchOps.estimate(QSketchOps.deserialize(v.asInstanceOf[Array[Byte]]), p)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllValue =
    copy(state = newChildren(0), pExpr = newChildren(1))
}

/** Scalar: total weight of a serialized state (exact row count until
  * the first compaction fires). */
case class KllN(state: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(state)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "kll_n"

  override def checkInputDataTypes(): TypeCheckResult =
    if (state.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a binary kll_state column")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val v = state.eval(input)
    if (v == null) return null
    QSketchOps.totalWeight(QSketchOps.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllN =
    copy(state = newChildren(0))
}

object KllAlgebra {
  private def asLit(e: Expression): Expression = e match {
    case l: Literal => l
    case other => Literal(other.eval(), other.dataType)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("kll_state", exprs => {
      require(exprs.length == 2, "kll_state(value, capacity)")
      KllState(exprs.head, asLit(exprs(1))).toAggregateExpression()
    }, "built-in")
    reg.createOrReplaceTempFunction("kll_merge", exprs => {
      require(exprs.length == 2, "kll_merge(state, capacity)")
      KllMerge(exprs.head, asLit(exprs(1))).toAggregateExpression()
    }, "built-in")
    reg.createOrReplaceTempFunction("kll_value", exprs => {
      require(exprs.length == 2, "kll_value(state, p)")
      KllValue(exprs.head, asLit(exprs(1)))
    }, "built-in")
    reg.createOrReplaceTempFunction("kll_n", exprs => {
      require(exprs.length == 1, "kll_n(state)")
      KllN(exprs.head)
    }, "built-in")
  }
}
