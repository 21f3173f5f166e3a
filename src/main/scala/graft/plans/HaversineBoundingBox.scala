package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.Haversine

/** Optimizer rule: a radius predicate `haversine_m(lat1, lon1, lat2,
  * lon2) <= r` implies the far cheaper latitude bound
  * `abs(lat1 - lat2) <= r / 111194.93` (meters per degree of latitude
  * is constant on the sphere). The rule injects that implied predicate
  * alongside the original — never replacing it — so semantics are
  * unchanged while:
  *
  *  - the cheap bound short-circuits the 4-trig haversine for distant
  *    pairs (most pairs, in a radius search), and
  *  - on a radius JOIN the implied predicate is a simple comparison of
  *    per-side expressions, which Catalyst can push through the join
  *    toward the scans — turning "evaluate trig on the cross product"
  *    into "band-prune first".
  *
  * The classic bounding-box trick from spatial engines, expressed as a
  * 20-line Catalyst rewrite over the native Haversine expression.
  * Injected by GraftExtensions (spark.sql.extensions) — see
  * HaversineBoundingBoxSpec for the fired-plan proof.
  */
object HaversineBoundingBox extends Rule[LogicalPlan] {

  private val MetersPerDegLat = 2.0 * math.Pi * 6371000.0 / 360.0

  /** Marker to keep the rewrite idempotent across fixed-point runs. */
  private val tag = org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.havbox")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if f.getTagValue(tag).isEmpty => {
      // Only TOP-LEVEL conjuncts may imply a bound: a radius predicate
      // under Or / Not / CaseWhen does not constrain the whole filter
      // (e.g. `haversine <= r OR city = 'X'` admits far rows), so the
      // condition is split on And and each conjunct matched directly —
      // no recursive collect.
      val bounds = splitConjunctivePredicates(cond).collect {
        case LessThanOrEqual(Haversine(lat1, _, lat2, _), r) if isCheap(r) =>
          latBound(lat1, lat2, r)
        case LessThan(Haversine(lat1, _, lat2, _), r) if isCheap(r) =>
          latBound(lat1, lat2, r)
        case GreaterThanOrEqual(r, Haversine(lat1, _, lat2, _)) if isCheap(r) =>
          latBound(lat1, lat2, r)
        case GreaterThan(r, Haversine(lat1, _, lat2, _)) if isCheap(r) =>
          latBound(lat1, lat2, r)
      }
      if (bounds.isEmpty) f
      else {
        val rewritten = Filter(bounds.foldLeft(cond)(And(_, _)), child)
        rewritten.setTagValue(tag, true)
        rewritten
      }
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }

  /** Only rewrite when the radius is cheap to duplicate (literal or
    * foldable) — duplicating an expensive radius expression would
    * trade one cost for another. */
  private def isCheap(r: Expression): Boolean = r.foldable

  private def latBound(lat1: Expression, lat2: Expression, r: Expression): Expression =
    LessThanOrEqual(
      Abs(Subtract(lat1, lat2)),
      Divide(r, Literal(MetersPerDegLat)))
}
