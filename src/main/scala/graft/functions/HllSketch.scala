package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `hll_registers(hash60, p)`: HyperLogLog register vector (Flajolet
  * et al. 2007) — the industry-standard distinct-count sketch beside
  * the suite's KMV (q67): 2^p one-byte registers answer COUNT DISTINCT
  * within ~1.04/√m relative error in CONSTANT memory, with map-side
  * partials and an elementwise-max combine, so a 100 TB cardinality
  * census costs one scan and ships 2^p bytes per group instead of the
  * key set.
  *
  * The input is a caller-derived 60-bit nonneg hash (15 md5 hex chars
  * — the repo-wide replayable-hash policy): bucket = top p bits,
  * rho = leading-zero rank of the remaining 60−p bits. Everything
  * downstream of the registers (harmonic mean, bias constant,
  * linear-counting small-range correction) is dyadic-exact or single
  * IEEE ops, so an independent engine — the DuckDB oracle — rebuilds
  * the registers with GROUP BY + MAX and lands on the bit-identical
  * estimate: the sketch's BEHAVIOR is under the hash gate, not just
  * its happy path.
  *
  * Evaluates to `array<int>` of length 2^p (the registers), keeping
  * the estimate assembly in plain built-ins on a 1-row-per-group
  * frame.
  */
case class HllRegistersAgg(child: Expression, pExpr: Expression,
                           override val mutableAggBufferOffset: Int = 0,
                           override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private lazy val p: Int = pExpr.eval().asInstanceOf[Number].intValue()
  private lazy val m: Int = 1 << p

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_registers"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a bigint hash column")
    else if (!pExpr.foldable || pExpr.dataType != IntegerType ||
      pExpr.eval() == null || pExpr.eval().asInstanceOf[Number].intValue() < 9 ||
      pExpr.eval().asInstanceOf[Number].intValue() > 16)
      // lower bound 9 (not Flajolet's 4): the dyadic-exact estimate
      // fold carries Σ 2^{52-M_j} in int64, which needs max rho =
      // 61-p <= 52, i.e. p >= 9. Below that a register could exceed
      // 52 and the shiftleft would wrap mod 64 and corrupt the sum.
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integer literal precision p in [9,16]")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllSketch.updateRegister(buf, v.asInstanceOf[Long], p)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllRegistersAgg =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

/** `hll_merge(registers, p)`: elementwise-max merge of HLL register
  * vectors — the SKETCH-ALGEBRA half of [[HllRegistersAgg]] and the
  * property that makes sketches the 100 TB distinct-count shape: a
  * fine-grain register table rolls up ANY grouping hierarchy without
  * rescanning the data, because max-merge of registers equals the
  * registers of the union (associative, commutative, idempotent — the
  * same invariant [[graft.streaming.StreamHll]] leans on for
  * at-least-once replay). Input rows are `array<int>` register
  * vectors of matching precision `p`. */
case class HllMergeAgg(child: Expression, pExpr: Expression,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private lazy val p: Int = pExpr.eval().asInstanceOf[Number].intValue()
  private lazy val m: Int = 1 << p

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
      child.dataType.asInstanceOf[ArrayType].elementType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<int> registers")
    else if (!pExpr.foldable || pExpr.dataType != IntegerType ||
      pExpr.eval() == null || pExpr.eval().asInstanceOf[Number].intValue() < 9 ||
      pExpr.eval().asInstanceOf[Number].intValue() > 16)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integer literal precision p in [9,16]")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == m,
        s"hll_merge: register vector has ${arr.numElements()} entries, expected $m")
      var i = 0
      while (i < m) {
        val r = arr.getInt(i)
        if (r > buf(i)) buf(i) = r.toByte
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

/** `hll_registers_multi(array<long> hashes, p, k)`: ONE aggregate
  * maintaining `k` independent HLL register sets — the table-profiler
  * shape ([[graft.core.Profile.sketchProfile]], q245). Profiling k
  * columns as k separate [[HllRegistersAgg]] buffers pays k
  * aggregate-function dispatches (child eval → null check → buffer
  * lookup) per ROW; here the k hashes arrive as one array column and
  * one dispatch updates all k register sets in a tight loop over a
  * single flat k·2^p byte buffer. Register bytes are BIT-IDENTICAL to
  * k separate `hll_registers` calls (same [[HllSketch.updateRegister]]
  * arithmetic, elementwise — pinned by HllSpec), so q245's oracle is
  * unchanged. Null array elements (null column values) are skipped,
  * matching the per-column aggregate's null handling; a null ARRAY
  * row never occurs (the profiler builds the array from column
  * expressions), but is skipped defensively. Evaluates to
  * `array<array<int>>` of k register vectors. */
case class HllRegistersMultiAgg(child: Expression, pExpr: Expression,
                                kExpr: Expression,
                                override val mutableAggBufferOffset: Int = 0,
                                override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private lazy val p: Int = pExpr.eval().asInstanceOf[Number].intValue()
  private lazy val m: Int = 1 << p
  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, pExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(IntegerType, containsNull = false), containsNull = false)
  override def prettyName: String = "hll_registers_multi"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
      child.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint> hashes")
    else if (!pExpr.foldable || pExpr.dataType != IntegerType ||
      pExpr.eval() == null || pExpr.eval().asInstanceOf[Number].intValue() < 9 ||
      pExpr.eval().asInstanceOf[Number].intValue() > 16)
      // same [9,16] bound as hll_registers: max rho must stay <= 52
      // for the dyadic-exact estimate fold downstream
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integer literal precision p in [9,16]")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType ||
      kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integer literal column count k >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](k * m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == k,
        s"$prettyName: hash array has ${arr.numElements()} entries, expected $k")
      var i = 0
      while (i < k) {
        if (!arr.isNullAt(i))
          HllSketch.updateRegisterAt(buf, i * m, arr.getLong(i), p)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    val n = k * m
    while (i < n) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData((0 until k).map { i =>
      val out = new Array[Int](m)
      var j = 0
      while (j < m) { out(j) = buf(i * m + j); j += 1 }
      new GenericArrayData(out)
    }.toArray[Any])

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegistersMultiAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegistersMultiAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllRegistersMultiAgg =
    copy(child = newChildren(0), pExpr = newChildren(1), kExpr = newChildren(2))
}

object HllSketch {
  val info: ExpressionInfo = new ExpressionInfo(classOf[HllRegistersAgg].getName, "hll_registers")
  val mergeInfo: ExpressionInfo = new ExpressionInfo(classOf[HllMergeAgg].getName, "hll_merge")
  val multiInfo: ExpressionInfo = new ExpressionInfo(classOf[HllRegistersMultiAgg].getName, "hll_registers_multi")

  def multiBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "hll_registers_multi(hashes, p, k)")
    def asLit(e: Expression): Expression = e match {
      case l: Literal => l
      case other => Literal(other.eval(), other.dataType)
    }
    HllRegistersMultiAgg(exprs.head, asLit(exprs(1)), asLit(exprs(2)))
      .toAggregateExpression()
  }

  def mergeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "hll_merge(registers, p)")
    val pE = exprs(1) match {
      case l: Literal => l
      case other => Literal(other.eval(), other.dataType)
    }
    HllMergeAgg(exprs.head, pE).toAggregateExpression()
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "hll_registers(hash60, p)")
    val pE = exprs(1) match {
      case l: Literal => l
      case other => Literal(other.eval(), other.dataType)
    }
    HllRegistersAgg(exprs.head, pE).toAggregateExpression()
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_registers", builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_merge", mergeBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_registers_multi", multiBuilder, "built-in")
    Hash60.register(spark) // hash60 columns resolve via the registry
  }

  /** The repo-standard replayable 60-bit hash: 15 md5 hex chars of the
    * tagged key, always nonnegative. Evaluates through the native
    * [[Hash60Expr]] kernel — bit-identical to the compositional
    * `conv(substr(md5('hll-tag' || key), 1, 15), 16, 10)` spelling the
    * DuckDB oracles replay (Hash60Spec pins the parity), without the
    * per-row hex-string round trip. */
  def hash60(key: Column, tag: String = ""): Column =
    call_function("hash60", key.cast("string"), lit(s"hll-$tag"))

  /** JVM twin of [[hash60]] for state-store operators
    * ([[graft.streaming.StreamHll]]) — identical bytes, identical
    * parse, so stream and batch registers are interchangeable. */
  def hash60Jvm(key: String, tag: String = ""): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hll-$tag$key".getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** In-place register update for a 60-bit hash — the exact arithmetic
    * [[HllRegistersAgg.update]] uses, shared so the streaming arm
    * cannot drift from the aggregate. */
  def updateRegister(regs: Array[Byte], h: Long, p: Int): Unit =
    updateRegisterAt(regs, 0, h, p)

  /** [[updateRegister]] against a sub-range of a flat multi-sketch
    * buffer ([[HllRegistersMultiAgg]]) — same arithmetic, offset base. */
  def updateRegisterAt(regs: Array[Byte], off: Int, h: Long, p: Int): Unit = {
    val wBits = 60 - p
    val bucket = (h >>> wBits).toInt & ((1 << p) - 1)
    val w = h & ((1L << wBits) - 1)
    val rho =
      if (w == 0L) wBits + 1
      else wBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > regs(off + bucket)) regs(off + bucket) = rho.toByte
  }

  /** HLL bias-correction constant alpha_m (Flajolet et al. 2007,
    * m >= 128), as the exact double both engines must use. */
  def alpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)

  /** Register-array folds for the estimate: zero-register count and
    * the dyadic-exact indicator sum Σ 2^{-M_j}, carried as the int64
    * Σ 2^{52-M_j}. M_j ≤ 52 holds because max rho = 61−p and the
    * aggregate rejects p < 9 — at smaller p a register could reach
    * 53+ and `shiftleft(1L, 52−r)` would shift by a negative amount,
    * wrapping mod 64. Interpreted HOF folds are fine HERE: they run
    * once per GROUP over 2^p elements, not per data row. */
  def zerosCol(registers: Column): Column =
    aggregate(registers, lit(0L),
      (acc, r) => acc + when(r === 0, lit(1L)).otherwise(lit(0L)))

  def sumExpS52Col(registers: Column): Column =
    aggregate(registers, lit(0L),
      (acc, r) => acc +
        call_function("shiftleft", lit(1L), lit(52) - r).cast("long"))

  /** Final estimate from (zeros, sumexp_s52) columns: raw
    * harmonic-mean estimate alpha·m²·2^52/sumexp with the
    * linear-counting small-range correction (raw ≤ 2.5m and empty
    * registers exist → m·ln(m/zeros)). Single IEEE steps only. */
  def estimateCol(zeros: Column, sumS52: Column, p: Int): Column = {
    val m = 1 << p
    val raw = lit(alpha(m)) * lit(m.toDouble) * lit(m.toDouble) *
      lit(math.pow(2.0, 52)) / sumS52
    when(zeros > 0 && raw <= lit(2.5 * m),
      lit(m.toDouble) * log(lit(m.toDouble) / zeros))
      .otherwise(raw)
  }
}
