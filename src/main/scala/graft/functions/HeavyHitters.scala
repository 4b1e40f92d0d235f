package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `heavy_hitters(item, capacity)`: a Misra–Gries frequent-items
  * summary per group — at most `capacity` (item, count) counters,
  * evaluated as an array of `struct<item, cnt>` ordered by
  * (cnt DESC, item ASC). A `TypedImperativeAggregate` with map-side
  * partials and the mergeable-summaries combine (sum counters, then
  * subtract the (capacity+1)-th largest count and drop non-positive),
  * so per-group memory is O(capacity) at ANY input size — the
  * frequency analogue of the KMV sketch in [[KMinHashes]].
  *
  * Guarantees (Misra–Gries / Agarwal et al. mergeable summaries):
  * estimates never exceed true counts, undercount by at most
  * n/(capacity+1), and every item with true frequency above
  * n/(capacity+1) is present. When `capacity` ≥ the group's distinct
  * count no decrement ever fires and the summary IS the exact
  * frequency table — deterministic under any partitioning, which is
  * the oracle-checkable regime; the approximation regime is
  * property-tested instead (HeavyHittersSpec).
  */
case class HeavyHitters(child: Expression, capExpr: Expression,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  private lazy val cap: Int = capExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
    else if (!capExpr.foldable || capExpr.dataType != IntegerType ||
      capExpr.eval() == null || capExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a positive integer literal capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      if (buf.containsKey(key)) buf.put(key, buf.get(key) + 1L)
      else if (buf.size < cap) buf.put(key, 1L)
      else decrementAll(buf, 1L) // classic MG: a full buffer absorbs the
                                 // new item by charging every counter
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    other.forEach { (k, v) =>
      if (buf.containsKey(k)) buf.put(k, buf.get(k) + v) else buf.put(k, v)
    }
    if (buf.size > cap) {
      // subtract the (cap+1)-th largest count; ≤ cap survivors remain
      val counts = new Array[Long](buf.size)
      var i = 0
      val it = buf.values().iterator()
      while (it.hasNext) { counts(i) = it.next(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(buf, counts(buf.size - cap - 1))
    }
    buf
  }

  private def decrementAll(buf: java.util.HashMap[String, Long], d: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
    }
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new java.util.ArrayList[java.util.Map.Entry[String, Long]](buf.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue, a.getValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val arr = new Array[AnyRef](entries.size())
    var i = 0
    while (i < entries.size()) {
      val e = entries.get(i)
      arr(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (k, v) => out.writeUTF(k); out.writeLong(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.put(in.readUTF(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0), capExpr = newChildren(1))
}

object HeavyHitters {
  val info: ExpressionInfo = new ExpressionInfo(classOf[HeavyHitters].getName, "heavy_hitters")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "heavy_hitters(item, capacity)")
    val capE = exprs(1) match {
      case l: Literal => l
      case other => Literal(other.eval(), other.dataType)
    }
    HeavyHitters(exprs.head, capE).toAggregateExpression()
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "heavy_hitters", builder, "built-in")
}
