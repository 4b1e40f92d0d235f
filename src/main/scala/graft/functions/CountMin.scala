package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `count_min(item, depth, width)`: a Count-Min frequency sketch per
  * group (Cormode & Muthukrishnan 2005) — `depth` hash rows of `width`
  * int64 counters, evaluated as one flat `array<long>` of length
  * `depth·width` (row-major: counter (d, c) at index d·width + c). A
  * `TypedImperativeAggregate` with map-side partials; the merge is
  * element-wise addition (the sketch is a linear transform of the
  * frequency vector), so per-group memory is O(depth·width) at ANY
  * input size and the result is bit-identical under any partitioning.
  *
  * Point estimates are SQL over the array — the row-d cell of item s is
  *   `element_at(sketch, d*width + cell(d, s) + 1)`
  * and the estimate is the min over d — so estimation composes with
  * ordinary column expressions and needs no second custom function.
  *
  * The row hash is engine-portable BY CONSTRUCTION (the same discipline
  * as the pipeline's md5 draws, ST8): cell(d, s) = the first 7 hex
  * chars of md5("<d>:<s>") parsed base-16, mod width. Any engine with
  * md5 replays every counter exactly — the DuckDB oracle rebuilds the
  * whole sketch from the raw rows (q163) — unlike seeds-in-Java
  * hashing, which would make the sketch a black box.
  *
  * Guarantees: estimates never undercount; with w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉
  * the overcount is ≤ ε·n with probability 1−δ. Unlike [[HeavyHitters]]
  * (which keeps the top items only) the sketch answers point queries
  * for ANY item after the fact, which is what the census oracle probes.
  */
case class CountMin(child: Expression, depthExpr: Expression, widthExpr: Expression,
                    override val mutableAggBufferOffset: Int = 0,
                    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val depth: Int = depthExpr.eval().asInstanceOf[Number].intValue()
  private lazy val width: Int = widthExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, depthExpr, widthExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def checkInputDataTypes(): TypeCheckResult = {
    def posIntLit(e: Expression, n: String): Option[String] =
      if (!e.foldable || e.dataType != IntegerType || e.eval() == null ||
        e.eval().asInstanceOf[Number].intValue() <= 0)
        Some(s"$prettyName requires a positive integer literal $n") else None
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string item column")
    else posIntLit(depthExpr, "depth").orElse(posIntLit(widthExpr, "width"))
      .map(TypeCheckResult.TypeCheckFailure).getOrElse {
        val d = depthExpr.eval().asInstanceOf[Number].longValue()
        val w = widthExpr.eval().asInstanceOf[Number].longValue()
        if (d * w > 16 * 1024 * 1024)
          TypeCheckResult.TypeCheckFailure(s"$prettyName buffer depth*width > 16M counters")
        else TypeCheckResult.TypeCheckSuccess
      }
  }

  /** cell(d, s): first 7 hex chars of md5("<d>:<s>") base-16, mod width
    * — 28 bits, so the parse can't overflow and any md5-bearing engine
    * reproduces it. */
  private def cell(d: Int, s: String): Int = {
    val md = MessageDigest.getInstance("MD5")
    val dig = md.digest(s"$d:$s".getBytes(StandardCharsets.UTF_8))
    // first 7 hex chars = 3.5 bytes: bytes 0-2 fully, high nibble of byte 3
    val v = ((dig(0) & 0xffL) << 20) | ((dig(1) & 0xffL) << 12) |
      ((dig(2) & 0xffL) << 4) | ((dig(3) & 0xf0L) >> 4)
    (v % width).toInt
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var d = 0
      while (d < depth) { buf(d * width + cell(d, s)) += 1L; d += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMin =
    copy(child = newChildren(0), depthExpr = newChildren(1), widthExpr = newChildren(2))
}

/** `cm_merge(sketch, depth, width)`: MERGE of Count-Min states — the
  * sketch-algebra rollup (same pattern as `hll_merge`): the sketch is a
  * linear transform of the frequency vector, so element-wise ADDITION
  * of fine-grain sketches yields, bit-for-bit, the sketch a direct
  * build at the coarser grain would produce. One register build at the
  * finest grain, every coarser grain without rescanning the data. */
case class CmMergeAgg(child: Expression, depthExpr: Expression, widthExpr: Expression,
                      override val mutableAggBufferOffset: Int = 0,
                      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val n: Int =
    depthExpr.eval().asInstanceOf[Number].intValue() *
      widthExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, depthExpr, widthExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cm_merge"

  override def checkInputDataTypes(): TypeCheckResult = {
    def posIntLit(e: Expression, nm: String): Option[String] =
      if (!e.foldable || e.dataType != IntegerType || e.eval() == null ||
        e.eval().asInstanceOf[Number].intValue() <= 0)
        Some(s"$prettyName requires a positive integer literal $nm") else None
    if (!child.dataType.isInstanceOf[ArrayType] ||
      child.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint> sketches")
    else posIntLit(depthExpr, "depth").orElse(posIntLit(widthExpr, "width"))
      .map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == n,
        s"cm_merge: sketch has ${arr.numElements()} counters, expected $n")
      var i = 0
      while (i < n) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val m = in.readInt()
    val buf = new Array[Long](m)
    var i = 0
    while (i < m) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmMergeAgg =
    copy(child = newChildren(0), depthExpr = newChildren(1), widthExpr = newChildren(2))
}

object CountMin {
  val info: ExpressionInfo = new ExpressionInfo(classOf[CountMin].getName, "count_min")
  val mergeInfo: ExpressionInfo = new ExpressionInfo(classOf[CmMergeAgg].getName, "cm_merge")

  private def asLit(e: Expression): Expression = e match {
    case l: Literal => l
    case other => Literal(other.eval(), other.dataType)
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "count_min(item, depth, width)")
    CountMin(exprs.head, asLit(exprs(1)), asLit(exprs(2))).toAggregateExpression()
  }

  def mergeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "cm_merge(sketch, depth, width)")
    CmMergeAgg(exprs.head, asLit(exprs(1)), asLit(exprs(2))).toAggregateExpression()
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_min", builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cm_merge", mergeBuilder, "built-in")
  }
}
