package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `thread_ctx(turns)`: per-thread SFT-context digests without ever
  * materializing a context string.
  *
  * Input: one thread's turns as `array<struct<node:bigint,
  * parent:bigint, text:string>>` (parent NULL marks the root).
  * Output: `array<struct<node:bigint, n_turns:bigint,
  * context_chars:bigint, context_md5:string>>` where the context of a
  * node is its root→node ancestor texts joined by `\n`.
  *
  * Thread contexts are PREFIX CHAINS — ctx(child) = ctx(parent) ‖
  * "\n" ‖ text(child) — so assembling each node's full context
  * (the q232 explode-join-reassemble shape) hashes O(Σ context
  * bytes) ≈ depth × corpus size: ~600 MB for a 50 MB corpus at
  * sf0.1, and quadratically worse for deeper threads. MD5 is a
  * streaming digest and the JDK engine is `clone()`-able, so walking
  * the thread tree root-ward-first and CLONING the parent's mid-state
  * before absorbing each child's text hashes every context in
  * O(Σ text bytes) — the digest of each context is bit-identical to
  * hashing the assembled string (pinned by ThreadCtxSpec).
  *
  * Character counts fold the same way (chars(child) = chars(parent)
  * + 1 + chars(text)), counted in CODE POINTS to match Spark's
  * `length` and the DuckDB oracle's.
  *
  * Scale shape: evaluated once per THREAD (a grouped collect_list —
  * threads are conversations, bounded by construction like the
  * repo's other per-group kernels, `operators/Chain` / `Nest`), so
  * the shuffle carries each turn's text once, never its context. */
case class ThreadCtxExpr(child: Expression) extends UnaryExpression {

  private val turnType = StructType(Seq(
    StructField("node", LongType), StructField("parent", LongType),
    StructField("text", StringType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
      if s.length == 3 && s(0).dataType == LongType &&
        s(1).dataType == LongType && s(2).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<node:bigint,parent:bigint,text:string>>")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("node", LongType, nullable = false),
    StructField("n_turns", LongType, nullable = false),
    StructField("context_chars", LongType, nullable = false),
    StructField("context_md5", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "thread_ctx"

  override def nullSafeEval(input: Any): Any =
    ThreadCtx.digests(input.asInstanceOf[ArrayData])

  // evaluated once per THREAD, not per row — the interpreted-fallback
  // codegen shell is fine here (the per-element work is the kernel)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ThreadCtx.digests((org.apache.spark.sql.catalyst.util.ArrayData) $c)")

  override protected def withNewChildInternal(newChild: Expression): ThreadCtxExpr =
    copy(child = newChild)
}

object ThreadCtx {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[ThreadCtxExpr].getName, "thread_ctx")

  private val hexDigits = "0123456789abcdef".toCharArray
  private val newline = Array[Byte]('\n')

  private final class St(val md: MessageDigest, val chars: Long, val depth: Long)

  def digests(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val nodes = new Array[Long](n)
    val parents = new Array[Long](n) // index into nodes, -1 = root
    val texts = new Array[UTF8String](n)
    val idx = new java.util.HashMap[Long, Int](n * 2)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      nodes(i) = row.getLong(0)
      texts(i) = row.getUTF8String(2)
      idx.put(nodes(i), i)
      i += 1
    }
    // duplicate turn ids would silently overwrite the parent map and
    // misresolve every descendant's context — input contract, fail fast
    require(idx.size == n,
      s"thread_ctx: ${n - idx.size} duplicate node id(s) in one thread")
    i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      parents(i) =
        if (row.isNullAt(1)) -1L
        else {
          val p = idx.get(row.getLong(1))
          if (p == null) -1L // dangling parent: forest contract, treat as root
          else p.intValue().toLong
        }
      i += 1
    }
    // roll contexts root-down with an explicit ancestor stack (threads
    // can be arbitrarily deep chains — no JVM recursion)
    val states = new Array[St](n)
    val stack = new Array[Int](n)
    i = 0
    while (i < n) {
      if (states(i) == null) {
        var top = 0
        var cur = i
        while (cur >= 0 && states(cur) == null) {
          stack(top) = cur; top += 1
          cur = parents(cur).toInt
        }
        val base: St = if (cur >= 0) states(cur) else null
        var st = base
        while (top > 0) {
          top -= 1
          val j = stack(top)
          val t = texts(j)
          st =
            if (st == null) {
              val md = MessageDigest.getInstance("MD5")
              md.update(t.getBytes)
              new St(md, t.numChars().toLong, 0L)
            } else {
              val md = st.md.clone().asInstanceOf[MessageDigest]
              md.update(newline)
              md.update(t.getBytes)
              new St(md, st.chars + 1L + t.numChars(), st.depth + 1L)
            }
          states(j) = st
        }
      }
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val st = states(i)
      val digest = st.md.clone().asInstanceOf[MessageDigest].digest()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(digest(b) & 0xf)
        b += 1
      }
      out(i) = InternalRow(nodes(i), st.depth + 1L, st.chars,
        UTF8String.fromString(new String(hex)))
      i += 1
    }
    new GenericArrayData(out)
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "thread_ctx(turns)")
    ThreadCtxExpr(exprs.head)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "thread_ctx", builder, "built-in")
}
