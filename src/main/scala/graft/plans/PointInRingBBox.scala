package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.PointInRing

/** Optimizer rule: a conjunctive `point_in_ring(x, y, <literal ring>)`
  * predicate implies the ring's bounding box, so the rule adds the four
  * range conjuncts `x ∈ [minx, maxx] AND y ∈ [miny, maxy]`.
  *
  * Why it matters at scale: the ray-cast itself is an opaque black box
  * to every storage format, but the derived ranges are ordinary
  * comparisons on plain columns — FileSourceStrategy pushes them into
  * the parquet scan (`PushedFilters`), so row groups whose min/max
  * statistics fall outside the zone are never read and the per-row PIP
  * test only runs on survivors. A Timor fishing zone covers a sliver of
  * the coordinate space; the scan skips the rest of the 100 TB.
  *
  * Injected via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`, runs inside the operator-optimization batch
  * to fixpoint — the semantic-duplicate check keeps it idempotent).
  * Registered rules must preserve semantics: PIP(p) ⇒ p ∈ bbox(ring),
  * so conjoining the box never changes the filter's row set.
  */
object PointInRingBBox extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val additions = conjuncts.flatMap {
        case PointInRing(x, y, ring)
            if ring.foldable && x.deterministic && y.deterministic =>
          bbox(ring).toSeq.flatMap { case (minx, maxx, miny, maxy) =>
            Seq(
              GreaterThanOrEqual(x, Literal(minx)), LessThanOrEqual(x, Literal(maxx)),
              GreaterThanOrEqual(y, Literal(miny)), LessThanOrEqual(y, Literal(maxy)))
          }
        case _ => Nil
      }.filterNot(a => conjuncts.exists(_.semanticEquals(a)))
      if (additions.isEmpty) f
      else Filter((conjuncts ++ additions).reduce(And), child)
  }

  private def bbox(ring: Expression): Option[(Double, Double, Double, Double)] = {
    val arr = ring.eval() match {
      case a: ArrayData if a.numElements() >= 6 && a.numElements() % 2 == 0 => a
      case _ => return None
    }
    val n = arr.numElements() / 2
    var (minx, maxx) = (Double.MaxValue, Double.MinValue)
    var (miny, maxy) = (Double.MaxValue, Double.MinValue)
    var i = 0
    while (i < n) {
      // a null vertex disables the rewrite rather than miscomputing a box
      if (arr.isNullAt(2 * i) || arr.isNullAt(2 * i + 1)) return None
      val x = arr.getDouble(2 * i); val y = arr.getDouble(2 * i + 1)
      if (x < minx) minx = x; if (x > maxx) maxx = x
      if (y < miny) miny = y; if (y > maxy) maxy = y
      i += 1
    }
    Some((minx, maxx, miny, maxy))
  }
}
