package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(tokens, k, distinct)`: the token k-gram kernel under
  * every shingle-based operator (Jaccard/MinHash/SimHash dedup, KMV
  * overlap, decontamination, repetition stats, winnowing) as ONE
  * native expression.
  *
  * Replaces the compositional spelling
  * `transform(sequence(1, n-k+1), i -> concat_ws(" ", element_at(tokens, i+j)…))`
  * (+ `array_distinct` for set semantics), which evaluates an
  * interpreted lambda — itself containing k interpreted `element_at`s
  * and a concat — once per token position: hundreds of interpreted
  * frames per document across every query in the dedup tail (the
  * [[graft.similarity.PqEncode]] trap class).
  *
  * Exact semantics parity with that spelling, which the DuckDB oracles
  * mirror:
  *  - fewer than k tokens (or a NULL token array) → EMPTY array (the
  *    `when(size(tokens) >= k, …).otherwise(array())` branch — note
  *    `size(NULL)` is NULL, so NULL input also lands in the otherwise);
  *  - NULL token elements are SKIPPED by the join, no separator left
  *    behind (concat_ws semantics);
  *  - `distinct = true` keeps first occurrences in position order
  *    (array_distinct semantics). */
case class WordNgrams(tokens: Expression, kExpr: Expression,
                      distinctExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, kExpr, distinctExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _)
      if kExpr.foldable && distinctExpr.foldable &&
        distinctExpr.dataType == BooleanType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int literal, boolean literal)")
  }

  @transient private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  @transient private lazy val distinct: Boolean =
    distinctExpr.eval().asInstanceOf[Boolean]
  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): Any = {
    val v = tokens.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new java.util.ArrayList[Any](n - k + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    i = 0
    while (i <= n - k) {
      // concat_ws(" ", …) skips null inputs entirely
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks(i + j); j += 1 }
      val gram = UTF8String.concatWs(space, parts: _*)
      if (seen == null || seen.add(gram)) out.add(gram)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordNgrams =
    copy(tokens = newChildren(0), kExpr = newChildren(1),
      distinctExpr = newChildren(2))
}

object WordNgrams {
  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[WordNgrams].getName, "word_ngrams")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "word_ngrams(tokens, k, distinct)")
    def asLit(e: Expression): Expression = e match {
      case l: Literal => l
      case other => Literal.create(other.eval(), other.dataType)
    }
    WordNgrams(exprs.head, asLit(exprs(1)), asLit(exprs(2)))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", builder, "built-in")
}
