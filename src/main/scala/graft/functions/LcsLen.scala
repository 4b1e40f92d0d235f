package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `lcs_len(a, b)`: longest-common-SUBSEQUENCE length between two
  * token arrays — the kernel under ROUGE-L (Lin 2004), the summary/
  * extraction eval that credits in-order token overlap without
  * requiring contiguity (where q103's overlap counts shared tokens and
  * q123's winnowed spans need exact contiguous matches).
  *
  * Classic two-row DP, O(|a|·|b|) time and O(min-side) memory per
  * evaluated pair. The SCALE CONTRACT is the caller's token cap:
  * truncate both sides (q264 caps at 32 tokens) so per-row cost is a
  * constant ~1k cell updates — the metric stays map-shaped at any
  * corpus size. Token equality is exact string equality (binary
  * UTF8String compare — no locale, identical in any engine).
  *
  * Like DEFLATE (q179), an O(n·m) DP is not SQL-replayable cell by
  * cell, so the q264 oracle pins per-pair LCS lengths computed by an
  * independent implementation (tools/lcs_oracle.py) — the engine value
  * must hash-match those literals; LcsLenSpec additionally pins parity
  * against an independent Scala recursion on real corpus pairs. */
case class LcsLen(a: Expression, b: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(a, b)
  override def nullable: Boolean = a.nullable || b.nullable
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_len"

  override def checkInputDataTypes(): TypeCheckResult = (a.dataType, b.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> inputs")
  }

  override def eval(input: InternalRow): Any = {
    val av = a.eval(input)
    val bv = b.eval(input)
    if (av == null || bv == null) return null
    val aa = av.asInstanceOf[ArrayData]
    val ba = bv.asInstanceOf[ArrayData]
    val n = aa.numElements()
    val m = ba.numElements()
    if (n == 0 || m == 0) return 0
    // two-row DP over the shorter side for O(min(n,m)) memory
    val (outer, inner, oLen, iLen) =
      if (m <= n) (aa, ba, n, m) else (ba, aa, m, n)
    val prev = new Array[Int](iLen + 1)
    val cur = new Array[Int](iLen + 1)
    var i = 1
    while (i <= oLen) {
      val oi = outer.getUTF8String(i - 1)
      var j = 1
      while (j <= iLen) {
        cur(j) =
          if (oi != null && oi.equals(inner.getUTF8String(j - 1)))
            prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, iLen + 1)
      i += 1
    }
    prev(iLen)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LcsLen =
    copy(a = newChildren(0), b = newChildren(1))
}

object LcsLen {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lcs_len", exprs => {
        require(exprs.length == 2, "lcs_len(a, b)")
        LcsLen(exprs.head, exprs(1))
      }, "built-in")
}
