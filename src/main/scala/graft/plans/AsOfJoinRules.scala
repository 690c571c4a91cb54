package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule making [[AsOfJoinPlan]] composable with Catalyst's
  * filter pushdown (custom nodes are pushdown barriers by default —
  * PushDownPredicates only knows the built-in operators).
  *
  * Two rewrites, both only for deterministic conjuncts of a Filter
  * sitting directly on the join:
  *
  *  1. A conjunct referencing only LEFT-side columns is pushed into
  *     the left child. Safe because the join emits exactly one output
  *     row per left row with the left columns unchanged, and each
  *     left row's match depends only on that row — dropping left rows
  *     early never changes the rows that survive.
  *  2. A conjunct referencing only the left JOIN KEYS is additionally
  *     mirrored onto the right child with keys substituted
  *     (left key -> right key). Right rows whose key fails the
  *     predicate could only ever match left rows that are themselves
  *     filtered out, so pruning them is safe — and it is the rewrite
  *     that matters at scale: a key predicate above the join prunes
  *     the (large) right side BEFORE its shuffle instead of after it.
  *
  * Conjuncts touching right-side outputs stay above the join: rid and
  * rtime are match results (null when nothing precedes), so they do
  * not commute.
  */
object PushFilterThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, aj: AsOfJoinPlan)
        if aj.leftKeys.forall(_.isInstanceOf[Attribute]) &&
           aj.rightKeys.forall(_.isInstanceOf[Attribute]) =>
      val lKeySet = aj.leftKeys.map(_.asInstanceOf[Attribute])
      val keyMap = lKeySet.zip(aj.rightKeys.map(_.asInstanceOf[Attribute])).toMap
      val conjuncts = splitConjunctivePredicates(cond)
      val (leftOnly, keep) = conjuncts.partition(c =>
        c.deterministic && c.references.subsetOf(aj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val keyOnly = leftOnly.filter(
          _.references.forall(a => lKeySet.exists(_.semanticEquals(a))))
        val newLeft = Filter(leftOnly.reduce(And), aj.left)
        val newRight = if (keyOnly.isEmpty) aj.right else {
          val mirrored = keyOnly.map(_.transform {
            case a: Attribute =>
              keyMap.collectFirst { case (l, r) if l.semanticEquals(a) => r }.getOrElse(a)
          })
          Filter(mirrored.reduce(And), aj.right)
        }
        val pushed = aj.copy(left = newLeft, right = newRight)
        if (keep.isEmpty) pushed
        else Filter(keep.reduce(And), pushed)
      }
  }
}
