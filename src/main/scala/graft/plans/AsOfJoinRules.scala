package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeMap, AttributeSet, BinaryComparison, Contains, EndsWith, Expression, In, InSet, IsNotNull, IsNull, Literal, Not, Or, PredicateHelper, StartsWith}
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
  *     the left child. Safe for arbitrary join-key expressions
  *     because the join emits exactly one output row per left row
  *     with the left columns unchanged, and each left row's match
  *     depends only on that row — dropping left rows early never
  *     changes the rows that survive.
  *  2. A conjunct referencing only the left JOIN KEYS is additionally
  *     mirrored onto the right child with keys substituted
  *     (left key -> right key). Right rows whose key fails the
  *     predicate could only ever match left rows that are themselves
  *     filtered out, so pruning them is safe — and it is the rewrite
  *     that matters at scale: a key predicate above the join prunes
  *     the (large) right side BEFORE its shuffle instead of after it.
  *     The mirror is gated twice beyond that:
  *       - every join key must be a bare Attribute with the SAME
  *         dataType on both sides, so substitution is type-preserving;
  *       - the conjunct must be built only of comparisons / set-
  *         membership / null tests over attributes and literals —
  *         expressions that cannot raise. The mirrored copy runs on
  *         right rows the original query never evaluated it on, so an
  *         ANSI-throwing predicate (division, cast, element_at) that
  *         succeeds on every join-output row could still blow up on a
  *         pruned-anyway right row (e.g. `10 div k = 10` with k=0
  *         present only on the right).
  *
  * Conjuncts touching right-side outputs stay above the join: rid and
  * rtime are match results (null when nothing precedes), so they do
  * not commute.
  */
object PushFilterThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {

  /** Expression whitelist for the right-side mirror: nodes that can
    * never raise at eval time, whatever row they see. */
  private def cannotThrow(e: Expression): Boolean = e match {
    case _: Attribute | _: Literal => true
    case _: And | _: Or | _: Not | _: BinaryComparison | _: In | _: InSet |
         _: IsNull | _: IsNotNull | _: StartsWith | _: EndsWith | _: Contains =>
      e.children.forall(cannotThrow)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (leftOnly, keep) = conjuncts.partition(c =>
        c.deterministic && c.references.subsetOf(aj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val newLeft = Filter(leftOnly.reduce(And), aj.left)
        // Mirror gate: bare same-type Attribute keys on both sides.
        val attrPairs = aj.leftKeys.zip(aj.rightKeys).collect {
          case (l: Attribute, r: Attribute) if l.dataType == r.dataType => (l, r)
        }
        val newRight = if (attrPairs.length != aj.leftKeys.length) aj.right else {
          val lKeySet = AttributeSet(attrPairs.map(_._1))
          val keyMap = AttributeMap(attrPairs)
          val keyOnly = leftOnly.filter(c =>
            c.references.subsetOf(lKeySet) && cannotThrow(c))
          if (keyOnly.isEmpty) aj.right
          else Filter(keyOnly.map(_.transform {
            case a: Attribute => keyMap.getOrElse(a, a)
          }).reduce(And), aj.right)
        }
        val pushed = aj.copy(left = newLeft, right = newRight)
        if (keep.isEmpty) pushed
        else Filter(keep.reduce(And), pushed)
      }
  }
}
