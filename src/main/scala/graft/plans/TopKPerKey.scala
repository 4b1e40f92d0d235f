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
  * physical strategy: a bounded k-element heap per key replaces both
  * full partition Sorts (O(n log k) selection, no sort buffers, memory
  * bounded by k·keys), the map side emits ≤ k rows per (partition, key)
  * before the exchange, the reduce side merges heaps, assigns ranks,
  * and subsumes the WindowExec+Filter entirely. The rewrite strips the
  * logical WindowGroupLimit the stock optimizer has already inserted —
  * otherwise both limiters would run stacked.
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

/** Shared bounded-heap pass: group the partition's rows by key, keep the
  * k order-smallest per key (the heap holds the current best k with the
  * worst at its head), emit each key's survivors in rank order. */
private[plans] trait TopKHeapLike { self: UnaryExecNode =>
  def partitionExprs: Seq[Expression]
  def order: Seq[SortOrder]
  def k: Int

  protected def topKGroups(iter: Iterator[InternalRow])
      : Iterator[Array[InternalRow]] = {
    val schema = child.output
    val keyProj = UnsafeProjection.create(partitionExprs, schema)
    val ord = RowOrdering.create(order, schema)
    val worstFirst = new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
    }
    val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val key = keyProj(row)
      var h = heaps.get(key)
      if (h == null) {
        h = new java.util.PriorityQueue[InternalRow](k + 1, worstFirst)
        heaps.put(key.copy(), h)
      }
      if (h.size < k) h.add(row.copy())
      else if (ord.compare(row, h.peek()) < 0) { h.poll(); h.add(row.copy()) }
    }
    heaps.values().iterator().asScala.map { h =>
      val arr = h.toArray(new Array[InternalRow](h.size))
      java.util.Arrays.sort(arr, ord)
      arr
    }
  }
}

/** Map-side partial top-k: no distribution requirement, runs before the
  * exchange and shrinks each partition to ≤ k rows per local key. */
case class TopKLocalExec(partitionExprs: Seq[Expression], order: Seq[SortOrder],
                         k: Int, child: SparkPlan)
    extends UnaryExecNode with TopKHeapLike {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(it => topKGroups(it).flatMap(_.iterator),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): TopKLocalExec =
    copy(child = newChild)
}

/** Reduce-side merge: requires clustering on the keys (the planner
  * inserts the exchange), merges the partial winners and appends the
  * 1-based rank column. */
case class TopKFinalExec(partitionExprs: Seq[Expression], order: Seq[SortOrder],
                         k: Int, rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode with TopKHeapLike {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val out = output
    val childOut = child.output
    child.execute().mapPartitions({ it =>
      val proj = UnsafeProjection.create(out, childOut :+ rankAttr)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      topKGroups(it).flatMap { arr =>
        arr.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, i + 1)
          proj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}
