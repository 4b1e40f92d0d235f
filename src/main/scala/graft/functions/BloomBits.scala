package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `bloom_bits(pos, m)`: a Bloom-filter bitset over bit positions —
  * the membership index trillion-token dedup pipelines carry instead
  * of the full key set (the Dolma/CCNet shape: a FIXED-size filter
  * answers "possibly landed already?" with a measurable
  * false-positive rate, vs an exact index that grows with the
  * corpus). A `TypedImperativeAggregate` whose buffer is `m/64`
  * packed longs: constant memory per group regardless of input
  * cardinality, map-side partials, bitwise-OR on combine. Evaluates
  * to `array<bigint>` so the PROBE side needs no custom code at all —
  * [[BloomBits.mightContain]] is built-in `forall`/`element_at`/
  * bit-ops, fully codegen'd, over the broadcast 1-row bitset.
  *
  * Position derivation is the caller's (md5-seeded double hashing via
  * [[BloomBits.positions]]), so an independent engine — the DuckDB
  * oracle — reproduces the exact same bits and the exact same false
  * positives: the filter's behavior itself is under the hash gate,
  * not just its happy path.
  */
case class BloomBitsAgg(child: Expression, mExpr: Expression,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val m: Int = mExpr.eval().asInstanceOf[Number].intValue()
  private lazy val words: Int = (m + 63) / 64

  override def children: Seq[Expression] = Seq(child, mExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType && child.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires an integral position column")
    else if (!mExpr.foldable || mExpr.dataType != IntegerType ||
      mExpr.eval() == null || mExpr.eval().asInstanceOf[Number].intValue() <= 0 ||
      mExpr.eval().asInstanceOf[Number].intValue() % 64 != 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a positive integer literal m divisible by 64")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val pos = v.asInstanceOf[Number].longValue()
      if (pos >= 0 && pos < m)
        buf((pos >> 6).toInt) |= (1L << (pos & 63))
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = java.nio.ByteBuffer.allocate(words * 8)
    buf.foreach(bytes.putLong)
    bytes.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomBitsAgg =
    copy(child = newChildren(0), mExpr = newChildren(1))
}

object BloomBits {
  val info: ExpressionInfo = new ExpressionInfo(classOf[BloomBitsAgg].getName, "bloom_bits")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "bloom_bits(pos, m)")
    val mE = exprs(1) match {
      case l: Literal => l
      case other => Literal(other.eval(), other.dataType)
    }
    BloomBitsAgg(exprs.head, mE).toAggregateExpression()
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_bits", builder, "built-in")

  /** k double-hashed bit positions for a string key: `(h1 + i·h2) mod
    * m`, both sub-hashes md5-derived (28-bit hex prefixes, seeded by
    * tag) so any md5-bearing engine derives identical bits. Returns
    * `array<bigint>` of length k. */
  def positions(key: Column, k: Int, m: Int, tag: String = ""): Column = {
    val h1 = conv(substring(md5(concat(lit(s"bf1-$tag"), key)), 1, 7), 16, 10)
      .cast("long") % m
    val h2 = conv(substring(md5(concat(lit(s"bf2-$tag"), key)), 1, 7), 16, 10)
      .cast("long") % m
    transform(sequence(lit(0), lit(k - 1)),
      i => (h1 + i.cast("long") * h2) % m)
  }

  /** JVM-side twin of [[positions]] — byte-identical derivation (md5
    * of the tagged key, 7-hex-char prefix, double hashing) for
    * executor-local consumers: the streaming sharded filter
    * ([[graft.streaming.StreamBloom]]) and specs. */
  def positionsJvm(key: String, k: Int, m: Int, tag: String = ""): Array[Long] = {
    def h(seed: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((seed + key).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString.take(7), 16) % m
    }
    val (h1, h2) = (h(s"bf1-$tag"), h(s"bf2-$tag"))
    Array.tabulate(k)(i => (h1 + i.toLong * h2) % m)
  }

  /** True iff every position's bit is set in the bitset column (an
    * `array<bigint>` from `bloom_bits`) — all built-in expressions
    * (`forall`/`element_at`/`shiftleft`/`&`), fully codegen'd. Takes
    * column NAMES (the SQL `shiftleft` accepts a column shift amount;
    * the Scala DSL wrapper does not). */
  def mightContain(bitsCol: String, positionsCol: String): Column =
    expr(s"""forall($positionsCol, p ->
      (element_at($bitsCol, CAST(p div 64 AS INT) + 1) &
       shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))) != 0)""")
}
