package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `k_min_hashes(h, k)`: the k lexicographically-smallest DISTINCT
  * values of a (hex-)hash string per group, ascending — the state of a
  * KMV cardinality sketch. A `TypedImperativeAggregate` whose buffer is
  * a bounded ordered set: constant k·|hash| memory per group, map-side
  * partials, set-merge on combine. This is the genuinely sublinear KMV
  * shape — dedup happens INSIDE the bounded buffer, so no global
  * `distinct` pre-pass and no per-group sort ever materializes the full
  * key set (`collect_set`/window-`row_number` forms do both).
  *
  * Hex md5 strings order identically to their numeric value, so the
  * k-th element's 8-hex-char prefix is the k-th minimum hash fraction
  * (ties on the prefix are real distinct hashes and keep their
  * multiplicity, exactly like a row_number over distinct full hashes).
  */
case class KMinHashes(child: Expression, kExpr: Expression,
                      override val mutableAggBufferOffset: Int = 0,
                      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "k_min_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType ||
      kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a positive integer literal k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def insert(buf: java.util.TreeSet[String], v: String): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v.compareTo(buf.last()) < 0 && buf.add(v)) { buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[String],
                      input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.toString)
    buf
  }

  override def merge(buf: java.util.TreeSet[String],
                     other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    other.forEach(v => insert(buf, v))
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    // non-destructive (window frames re-evaluate the live buffer)
    val arr = new Array[AnyRef](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach(v => out.writeUTF(v))
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(in.readUTF()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KMinHashes =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** `kmv_merge(tops, k)`: MERGE of KMV states — the sketch-algebra
  * rollup beside `hll_merge`/`cm_merge`: the k smallest distinct hashes
  * of a UNION are all contained in the union of each part's k smallest
  * distinct hashes, so re-capping the merged candidate set at k yields,
  * bit-for-bit, the state a direct build over the union would produce.
  * Input is the `k_min_hashes` output array; the buffer is the same
  * bounded ordered set. */
case class KmvMergeAgg(child: Expression, kExpr: Expression,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kmv_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
      child.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<string> state")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType ||
      kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a positive integer literal k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def insert(buf: java.util.TreeSet[String], v: String): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v.compareTo(buf.last()) < 0 && buf.add(v)) { buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[String],
                      input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        insert(buf, arr.getUTF8String(i).toString); i += 1
      }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[String],
                     other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    other.forEach(v => insert(buf, v))
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val arr = new Array[AnyRef](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach(v => out.writeUTF(v))
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(in.readUTF()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** `k_min_hashes_long(h, k)`: [[KMinHashes]] over int64 hashes — the
  * [[Hash60]]-kernel arm of the KMV state for wide profiling scans
  * (q247's per-table/per-column sketches): the string arm pays a
  * 32-hex-char md5 materialization per row plus string comparisons
  * in the bounded heap AND 32-byte keys through every distinct
  * shuffle; the long arm hashes straight off the key bytes and keeps
  * 8-byte keys end to end. Ordering semantics are identical (hex md5
  * strings order as their numeric value), so the downstream k-minima
  * set algebra — union, sort, slice, intersect — is unchanged. */
case class KMinHashesLong(child: Expression, kExpr: Expression,
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "k_min_hashes_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != org.apache.spark.sql.types.LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a bigint column")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType ||
      kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a positive integer literal k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last() && buf.add(v)) { buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    other.forEach(v => insert(buf, v))
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach(v => out.writeLong(v))
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinHashesLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinHashesLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KMinHashesLong =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object KMinHashes {
  val info: ExpressionInfo = new ExpressionInfo(classOf[KMinHashes].getName, "k_min_hashes")
  val longInfo: ExpressionInfo = new ExpressionInfo(classOf[KMinHashesLong].getName, "k_min_hashes_long")
  val mergeInfo: ExpressionInfo = new ExpressionInfo(classOf[KmvMergeAgg].getName, "kmv_merge")

  private def asLit(e: Expression): Expression = e match {
    case l: Literal => l
    case other => Literal(other.eval(), other.dataType)
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "k_min_hashes(h, k)")
    KMinHashes(exprs.head, asLit(exprs(1))).toAggregateExpression()
  }

  def mergeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "kmv_merge(tops, k)")
    KmvMergeAgg(exprs.head, asLit(exprs(1))).toAggregateExpression()
  }

  def longBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "k_min_hashes_long(h, k)")
    KMinHashesLong(exprs.head, asLit(exprs(1))).toAggregateExpression()
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "k_min_hashes", builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "k_min_hashes_long", longBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_merge", mergeBuilder, "built-in")
    Hash60.register(spark) // the long arm's hash kernel
  }
}
