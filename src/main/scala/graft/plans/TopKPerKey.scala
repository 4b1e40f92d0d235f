package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension: top-k per key as a first-class plan.
  *
  * `filter(row_number().over(partitionBy(keys).orderBy(o)) <= k)` is the
  * engine's (and the reference's) "best k per group" idiom — q12's
  * keep-first dedupe, the KNN top-k ranking. Stock Spark ≥3.5 already
  * optimizes it (InferWindowGroupLimit → sort-based
  * `WindowGroupLimitExec` partial/final around the exchange), so this
  * operator is NOT filling a gap — it is the heap-based alternative
  * physical strategy: the map side selects each local key's best k with
  * bounded heaps instead of a full partition sort (O(n log k), flushing
  * past a key-count cap so memory stays bounded at any cardinality) and
  * emits the reduced winners before the exchange; the reduce side sorts
  * only those reduced rows (Spark's spillable SortExec) and streams
  * ranks with O(1) state, subsuming the WindowExec+Filter entirely. The
  * rewrite strips the logical WindowGroupLimit the stock optimizer has
  * already inserted — otherwise both limiters would run stacked.
  *
  * The complete custom-operator ladder, registered via
  * [[graft.functions.GraftExtensions]]:
  *   logical [[TopKPerKeyNode]] ← optimizer [[RewriteRankFilterToTopK]]
  *   ← strategy [[TopKPerKeyStrategy]] → physical [[TopKLocalExec]] +
  *   [[TopKFinalExec]].
  */
case class TopKPerKeyNode(partitionExprs: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: Attribute, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Matches a Filter(rank cond) directly above a Window computing exactly
  * one row_number, with a deterministic total order. Conservative on
  * purpose: any other shape keeps the stock plan. */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  private def limit(cond: Expression, rankId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(v)) if a.exprId == rankId => Some(v)
    case LessThan(a: AttributeReference, IntegerLiteral(v)) if a.exprId == rankId => Some(v - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) if a.exprId == rankId => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(ps, os, _)), _)), _, _, child, _))
        if os.nonEmpty && os.forall(_.child.deterministic) &&
          ps.forall(_.deterministic) &&
          limit(cond, alias.exprId).exists(_ > 0) =>
      // the stock optimizer may already have inserted its sort-based
      // WindowGroupLimit below the Window — the heap operator subsumes it
      val input = child match {
        case org.apache.spark.sql.catalyst.plans.logical
          .WindowGroupLimit(_, _, _, _, grandchild) => grandchild
        case other => other
      }
      TopKPerKeyNode(ps, os, limit(cond, alias.exprId).get, alias.toAttribute, input)
  }
}

object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(ps, os, k, rank, child) =>
      TopKFinalExec(ps, os, k, rank,
        TopKLocalExec(ps, os, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Map-side partial top-k: no distribution requirement, runs before the
  * exchange and shrinks each partition to ≤ k rows per local key.
  *
  * Memory safety at unbounded key cardinality: the per-key heaps live
  * in one hash map, so when the map passes [[TopKLocalExec.FlushKeys]]
  * distinct keys the accumulated winners are FLUSHED downstream and the
  * map restarts. A flushed partition emits more than k rows for keys
  * seen in several flush epochs — still a correct partial reduction
  * (every true top-k row survives), and the final pass re-selects.
  * Bounded memory, no spill machinery needed. */
case class TopKLocalExec(partitionExprs: Seq[Expression], order: Seq[SortOrder],
                         k: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(partitionExprs, schema)
      val ord = RowOrdering.create(order, schema)
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      var heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      def drain(): Iterator[InternalRow] = {
        val done = heaps
        heaps = new java.util.LinkedHashMap
        done.values().iterator().asScala.flatMap(_.iterator().asScala)
      }
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private def refill(): Unit = {
          while (!out.hasNext && it.hasNext) {
            val row = it.next()
            val key = keyProj(row)
            var h = heaps.get(key)
            if (h == null) {
              if (heaps.size >= TopKLocalExec.FlushKeys) out = drain()
              h = new java.util.PriorityQueue[InternalRow](k + 1, worstFirst)
              heaps.put(key.copy(), h)
            }
            if (h.size < k) h.add(row.copy())
            else if (ord.compare(row, h.peek()) < 0) { h.poll(); h.add(row.copy()) }
          }
          if (!out.hasNext && !it.hasNext && !heaps.isEmpty) out = drain()
        }
        override def hasNext: Boolean = { refill(); out.hasNext }
        override def next(): InternalRow = { refill(); out.next() }
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKLocalExec =
    copy(child = newChild)
}

object TopKLocalExec {
  /** Max distinct keys buffered per task before a flush (heap memory ≈
    * FlushKeys × k × row size; 100k keys × small rows ≈ tens of MB). */
  val FlushKeys: Int = 100000
}

/** Reduce-side pass: requires clustering on the keys AND a (keys, order)
  * sort — the sort runs on the locally-reduced rows (≤ k per partition
  * per key epoch) and is Spark's spillable SortExec, so this operator
  * itself streams with O(k) state: rows of a key arrive rank-ordered,
  * emit the first k with their rank and drop the rest. */
case class TopKFinalExec(partitionExprs: Seq[Expression], order: Seq[SortOrder],
                         k: Int, rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partitionExprs.map(SortOrder(_, Ascending)) ++ order)

  override protected def doExecute(): RDD[InternalRow] = {
    val out = output
    val childOut = child.output
    child.execute().mapPartitions({ it =>
      val proj = UnsafeProjection.create(out, childOut :+ rankAttr)
      val keyProj = UnsafeProjection.create(partitionExprs, childOut)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      var currentKey: UnsafeRow = null
      var rank = 0
      it.flatMap { row =>
        val key = keyProj(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy()
          rank = 0
        }
        rank += 1
        if (rank <= k) {
          rankRow.update(0, rank)
          Iterator.single(proj(joined(row, rankRow)))
        } else Iterator.empty
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}
