package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_counts(text, lefts, rights)`: one-pass BPE-encode census —
  * struct(n_words, n_chars, n_tokens) for the `[a-z]+` words of `text`
  * under the ordered merge table (lefts[i], rights[i]) — bit-identical
  * to [[graft.text.Bpe.applyMergesCol]]'s wrapped-symbol replace chain
  * (q262's oracle replays THAT chain, so the kernel sits under the
  * same hash gate), at one array walk instead of ~10 corpus-sized
  * string materializations: the chain allocates the 3× wrapped string
  * plus a fresh copy per merge (measured 8.5 s at sf1); the kernel
  * tokenizes and merges in place over span indices (1.0 s). Same
  * semantics: per merge, scan symbols left-to-right, fuse (a,b)
  * matches, continue AFTER the fused symbol — exactly how string
  * `replace` continues after each replacement.
  */
case class BpeEncode(text: Expression, leftsExpr: Expression, rightsExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, leftsExpr, rightsExpr)
  override def nullable: Boolean = text.nullable
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))
  override def prettyName: String = "bpe_counts"

  override def checkInputDataTypes(): TypeCheckResult = text.dataType match {
    case StringType if leftsExpr.foldable && rightsExpr.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<string> literal, array<string> literal)")
  }

  @transient private lazy val merges: Array[(Array[Char], Array[Char])] = {
    val l = leftsExpr.eval().asInstanceOf[ArrayData]
    val r = rightsExpr.eval().asInstanceOf[ArrayData]
    require(l.numElements() == r.numElements(),
      s"$prettyName: lefts and rights must have equal length")
    (0 until l.numElements()).map { i =>
      (l.getUTF8String(i).toString.toCharArray,
        r.getUTF8String(i).toString.toCharArray)
    }.toArray
  }

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) return null
    // [a-z]+ words are pure ASCII, so byte positions == char positions
    // within a word; scan the UTF-8 bytes directly
    val bytes = t.asInstanceOf[UTF8String].getBytes
    var nWords = 0L
    var nChars = 0L
    var nTokens = 0L
    // reusable span buffers sized to the longest word seen
    var starts = new Array[Int](64)
    var lens = new Array[Int](64)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') {
        val w0 = i
        while (i < bytes.length && bytes(i) >= 'a' && bytes(i) <= 'z') i += 1
        val wLen = i - w0
        nWords += 1
        nChars += wLen
        if (wLen > starts.length) {
          starts = new Array[Int](wLen); lens = new Array[Int](wLen)
        }
        var n = wLen // symbol count; symbol j = bytes[starts(j), +lens(j))
        var j = 0
        while (j < wLen) { starts(j) = w0 + j; lens(j) = 1; j += 1 }
        var m = 0
        while (m < merges.length && n > 1) {
          val a = merges(m)._1
          val bb = merges(m)._2
          var src = 0
          var dst = 0
          while (src < n) {
            if (src + 1 < n && spanEq(bytes, starts(src), lens(src), a) &&
                spanEq(bytes, starts(src + 1), lens(src + 1), bb)) {
              // fuse: spans are adjacent within the word, so the merged
              // symbol is the contiguous range; continue AFTER it
              starts(dst) = starts(src)
              lens(dst) = lens(src) + lens(src + 1)
              src += 2
            } else {
              starts(dst) = starts(src); lens(dst) = lens(src)
              src += 1
            }
            dst += 1
          }
          n = dst
          m += 1
        }
        nTokens += n
      } else i += 1
    }
    new GenericInternalRow(Array[Any](nWords, nChars, nTokens))
  }

  private def spanEq(bytes: Array[Byte], start: Int, len: Int, s: Array[Char]): Boolean = {
    if (len != s.length) return false
    var k = 0
    while (k < len) {
      if (bytes(start + k) != s(k)) return false
      k += 1
    }
    true
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BpeEncode =
    copy(text = newChildren(0), leftsExpr = newChildren(1), rightsExpr = newChildren(2))
}

object BpeEncode {
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "bpe_counts(text, lefts, rights)")
    def asLit(e: Expression): Expression = e match {
      case l: Literal => l
      case other => Literal.create(other.eval(), other.dataType)
    }
    BpeEncode(exprs.head, asLit(exprs(1)), asLit(exprs(2)))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_counts", builder, "built-in")
}
