package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `top_k_min(x, k)`: the k smallest non-null values of `x` per group,
  * as an ascending `array<double>` — the aggregate-function rung of the
  * extension ladder (scalar expressions: [[HaversineKm]]; optimizer
  * rules: PointInRingBBox; whole operators: TopKPerKey). A
  * `TypedImperativeAggregate` whose buffer is a bounded k-element
  * max-heap: constant memory per group, map-side partial aggregation,
  * heap-merge on combine — where `collect_list` + `array_sort` +
  * `slice` would buffer entire groups. Mirrors DuckDB's `min(x, n)`
  * for oracle parity.
  */
case class TopKMin(child: Expression, kExpr: Expression,
                   override val mutableAggBufferOffset: Int = 0,
                   override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "top_k_min"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a double column")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType ||
      kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a positive integer literal k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1,
      java.util.Collections.reverseOrder[java.lang.Double]())

  private def insert(buf: java.util.PriorityQueue[java.lang.Double], v: Double): Unit =
    if (buf.size < k) buf.add(v)
    else if (v < buf.peek()) { buf.poll(); buf.add(v) }

  override def update(buf: java.util.PriorityQueue[java.lang.Double],
                      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: java.util.PriorityQueue[java.lang.Double],
                     other: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    other.forEach(v => insert(buf, v))
    buf
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Double]): Any = {
    // non-destructive: window aggregation evaluates the SAME live buffer
    // once per row, so draining it here would corrupt every later frame
    val arr = new Array[Double](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach(v => out.writeDouble(v))
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(in.readDouble()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKMin =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object TopKMin {
  val info: ExpressionInfo = new ExpressionInfo(classOf[TopKMin].getName, "top_k_min")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "top_k_min(x, k)")
    val x = if (exprs.head.dataType == DoubleType) exprs.head
            else Cast(exprs.head, DoubleType)
    val kE = exprs(1) match {
      case l: Literal => l
      case other => Literal(other.eval(), other.dataType)
    }
    TopKMin(x, kE).toAggregateExpression()
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_min", builder, "built-in")
}
