package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `ac_counts(text, dict)`: per-pattern substring match counts over a
  * literal phrase dictionary, by Aho–Corasick (CACM '75) — ONE pass
  * over the text regardless of dictionary size, overlapping matches
  * included. The scale story of every large blocklist/boilerplate
  * census: per-pattern `contains`/regex scans cost O(chars · patterns)
  * and real badword/boilerplate lists run to thousands of phrases;
  * the automaton costs O(chars + matches) with the dictionary compiled
  * once per plan. Complements [[graft.text.QualityFilters.blocklistTag]]
  * (exact-token semantics, small word lists) with SUBSTRING/phrase
  * semantics.
  *
  * Returns `array<long>` aligned with the dict literal (counts(i) =
  * occurrences of dict(i)); totals/distinct-counts derive as bounded
  * array expressions downstream. Matching is by UTF-16 code unit
  * (BMP-exact, the [[JaroWinkler]] convention); case-sensitive —
  * lowercase upstream for case-insensitive lists. `CodegenFallback`
  * per the [[graft.similarity.PqEncode]] precedent: the per-row work
  * IS the automaton walk; no expression-tree overhead remains to fuse. */
case class AcCounts(text: Expression, dict: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, dict)
  override def nullable: Boolean = text.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ac_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")
    else if (!dict.foldable || !dict.dataType.isInstanceOf[ArrayType] ||
      dict.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal array<string> dictionary")
    else {
      val pats = AcCounts.patternsOf(dict)
      if (pats.isEmpty || pats.exists(_.isEmpty))
        TypeCheckResult.TypeCheckFailure(s"$prettyName patterns must be non-empty")
      else if (pats.distinct.length != pats.length)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName patterns must be distinct (counts align by index)")
      else TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val patterns: Array[String] = AcCounts.patternsOf(dict)
  @transient private lazy val automaton: AcCounts.Automaton =
    AcCounts.build(patterns)

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) return null
    val s = t.toString
    val counts = new Array[Long](patterns.length)
    val a = automaton
    var state = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var st = state
      while (st != 0 && !a.goto(st).containsKey(c)) st = a.fail(st)
      val nxt = a.goto(st).get(c)
      state = if (nxt == null) 0 else nxt.intValue()
      val out = a.out(state)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(counts.map(Long.box))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AcCounts =
    copy(text = newChildren(0), dict = newChildren(1))
}

object AcCounts {

  private[functions] def patternsOf(dict: Expression): Array[String] =
    dict.eval().asInstanceOf[ArrayData]
      .toObjectArray(StringType)
      .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  /** goto maps per node, failure links, and MERGED output pattern
    * indexes per node (own endings ++ outputs of the failure chain,
    * precomputed so the walk never follows fail links for output). */
  final case class Automaton(goto: Array[java.util.HashMap[Character, Integer]],
                             fail: Array[Int], out: Array[Array[Int]])

  def build(patterns: Array[String]): Automaton = {
    val goto = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        val nxt = goto(s).get(c)
        s = if (nxt != null) nxt.intValue()
        else {
          goto += new java.util.HashMap[Character, Integer]()
          ends += Nil
          goto(s).put(c, goto.length - 1)
          goto.length - 1
        }
      }
      ends(s) = pi :: ends(s)
    }
    val n = goto.length
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = ends(0).toArray
    val queue = new java.util.ArrayDeque[Int]()
    goto(0).forEach { (_, v) =>
      fail(v) = 0
      queue.add(v)
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      out(u) = (ends(u) ++ out(fail(u)).toList).toArray
      goto(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && !goto(f).containsKey(c)) f = fail(f)
        val g = goto(f).get(c)
        fail(v) = if (g != null && g.intValue() != v.intValue()) g.intValue() else 0
        queue.add(v.intValue())
      }
    }
    Automaton(goto.toArray, fail, out)
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "ac_counts(text, dict)")
    val d = exprs(1) match {
      case l: Literal => l
      case other => Literal.create(other.eval(), other.dataType)
    }
    AcCounts(exprs.head, d)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ac_counts", builder, "built-in")
}
