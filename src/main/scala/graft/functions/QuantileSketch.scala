package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mutable compactor-sketch state: `levels(i)` holds items of weight
  * 2^i, `parity(i)` alternates which half survives the next compaction
  * at level i (the deterministic-KLL trick — consecutive compactions
  * at a level cancel each other's rank bias to within one item). */
final class QSketchBuffer {
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  val parity: ArrayBuffer[Boolean] = ArrayBuffer(false)
}

/** `quantile_sketch(value, p, capacity)`: a mergeable quantile sketch —
  * the KLL/MRL compactor scheme with equal per-level capacity and
  * deterministic alternating-parity compaction. Per-group memory is
  * O(capacity · log(n/capacity)) at ANY input size, partials merge
  * map-side, and no per-group value buffering ever happens on one task
  * — the sketch analogue of [[graft.stats.SortPercentile]]'s exact
  * histogram plan, for when one pass over 100 TB must answer many
  * quantiles cheaply.
  *
  * Mechanics: items enter level 0 (weight 1). A level that exceeds
  * `capacity` is sorted and its odd- or even-indexed half (alternating
  * per level) is promoted to the next level at double weight. The
  * final estimate interpolates the weighted order statistics at rank
  * h = (W−1)·p — exactly R type 7 over the surviving weighted sample.
  *
  * Regimes:
  *  - **exact** (group size ≤ capacity): no compaction ever fires, the
  *    sketch holds the whole group at weight 1, and the answer IS the
  *    exact type-7 quantile — deterministic under any partitioning and
  *    hash-checkable against `quantile_cont` (q113).
  *  - **approximate** (above capacity): rank error grows as
  *    O(W·log₂(W/capacity)/capacity); merge order across partitions
  *    may move the estimate within that bound, so this regime is
  *    property-tested (QuantileSketchSpec: adversarial orders, bound
  *    asserted), never oracle-hashed.
  */
case class QuantileSketch(child: Expression, pExpr: Expression, capExpr: Expression,
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QSketchBuffer] {

  // SQL fractional literals arrive as Decimal, which is not a Number
  private def asDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }
  private lazy val p: Double = asDouble(pExpr.eval())
  // an odd capacity halves unevenly; round up so splits stay balanced
  private lazy val cap: Int = {
    val c = capExpr.eval().asInstanceOf[Number].intValue()
    if (c % 2 == 0) c else c + 1
  }

  override def children: Seq[Expression] = Seq(child, pExpr, capExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantile_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a double column")
    else if (!pExpr.foldable || pExpr.eval() == null ||
      { val v = asDouble(pExpr.eval()); v < 0.0 || v > 1.0 })
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal p in [0, 1]")
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

  override def eval(buf: QSketchBuffer): Any = QSketchOps.estimate(buf, p)

  override def serialize(buf: QSketchBuffer): Array[Byte] = QSketchOps.serialize(buf)

  override def deserialize(bytes: Array[Byte]): QSketchBuffer = QSketchOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(child = newChildren(0), pExpr = newChildren(1), capExpr = newChildren(2))
}

/** Compactor-buffer operations shared by [[QuantileSketch]] and the
  * state algebra ([[KllState]]/[[KllMerge]]/[[KllValue]]) — extracted
  * verbatim so the sketch DYNAMICS are defined in exactly one place. */
object QSketchOps {

  def insert(buf: QSketchBuffer, v: Double, cap: Int): Unit = {
    buf.levels(0) += v
    if (buf.levels(0).length > cap) compact(buf, 0, cap)
  }

  def mergeInto(buf: QSketchBuffer, other: QSketchBuffer, cap: Int): Unit = {
    var i = 0
    while (i < other.levels.length) {
      while (buf.levels.length <= i) { buf.levels += ArrayBuffer.empty; buf.parity += false }
      buf.levels(i) ++= other.levels(i)
      i += 1
    }
    i = 0
    while (i < buf.levels.length) { // bottom-up: promotions cascade
      if (buf.levels(i).length > cap) compact(buf, i, cap)
      i += 1
    }
  }

  /** Sort level i, promote its alternating half at double weight. */
  def compact(buf: QSketchBuffer, i: Int, cap: Int): Unit = {
    val arr = buf.levels(i).toArray
    java.util.Arrays.sort(arr)
    if (buf.levels.length <= i + 1) { buf.levels += ArrayBuffer.empty; buf.parity += false }
    val start = if (buf.parity(i)) 1 else 0
    buf.parity(i) = !buf.parity(i)
    val next = buf.levels(i + 1)
    var j = start
    while (j < arr.length) { next += arr(j); j += 2 }
    buf.levels(i).clear()
    if (next.length > cap) compact(buf, i + 1, cap)
  }

  /** Total weight held (Σ level_size · 2^level) — the exact row count
    * when no compaction has fired (level 0 only). */
  def totalWeight(buf: QSketchBuffer): Long = {
    var w = 0L
    var i = 0
    while (i < buf.levels.length) { w += buf.levels(i).length.toLong << i; i += 1 }
    w
  }

  def estimate(buf: QSketchBuffer, p: Double): Any = {
    // weighted order statistics: value-sorted (v, 2^level) pairs
    var n = 0
    var i = 0
    while (i < buf.levels.length) { n += buf.levels(i).length; i += 1 }
    if (n == 0) return null
    val vs = new Array[Double](n)
    val ws = new Array[Long](n)
    var k = 0
    i = 0
    while (i < buf.levels.length) {
      val lvl = buf.levels(i)
      var j = 0
      while (j < lvl.length) { vs(k) = lvl(j); ws(k) = 1L << i; k += 1; j += 1 }
      i += 1
    }
    val idx = (0 until n).sortBy(vs(_)).toArray
    val totalW = ws.sum
    // R type 7 over the weighted expansion: rank h in [0, W-1]
    val h = (totalW - 1) * p
    val lo = math.floor(h).toLong
    def valueAt(rank: Long): Double = {
      var cum = 0L
      var t = 0
      while (t < n) {
        cum += ws(idx(t))
        if (cum > rank) return vs(idx(t))
        t += 1
      }
      vs(idx(n - 1))
    }
    val vLo = valueAt(lo)
    val vHi = if (lo + 1 > totalW - 1) vLo else valueAt(lo + 1)
    vLo + (h - lo) * (vHi - vLo)
  }

  def serialize(buf: QSketchBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.levels.length)
    var i = 0
    while (i < buf.levels.length) {
      out.writeBoolean(buf.parity(i))
      out.writeInt(buf.levels(i).length)
      buf.levels(i).foreach(out.writeDouble)
      i += 1
    }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QSketchBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new QSketchBuffer()
    buf.levels.clear(); buf.parity.clear()
    val nLevels = in.readInt()
    (0 until nLevels).foreach { _ =>
      buf.parity += in.readBoolean()
      val sz = in.readInt()
      val lvl = new ArrayBuffer[Double](sz)
      (0 until sz).foreach(_ => lvl += in.readDouble())
      buf.levels += lvl
    }
    buf
  }
}

object QuantileSketch {
  val info: ExpressionInfo = new ExpressionInfo(classOf[QuantileSketch].getName, "quantile_sketch")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "quantile_sketch(value, p, capacity)")
    def lit(e: Expression): Expression = e match {
      case l: Literal => l
      case other => Literal(other.eval(), other.dataType)
    }
    QuantileSketch(exprs.head, lit(exprs(1)), lit(exprs(2))).toAggregateExpression()
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_sketch", builder, "built-in")
}
