package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: plan SQL range joins with the bucketized
  * equi-join strategy of [[graft.operators.RangeJoin]] instead of a
  * nested loop.
  *
  * Spark has no range-join strategy, so
  * `FROM p JOIN iv ON p.t BETWEEN iv.lo AND iv.hi` plans as
  * BroadcastNestedLoopJoin — O(|p|·|iv|) comparisons and a full broadcast
  * of one side. `RangeJoin.pointInInterval` fixes that for DataFrame
  * callers; this rule gives the SAME rewrite to SQL users: when
  * `spark.graft.rangeJoin.bucketWidth` is set to a positive integer W and
  * an inner join's condition bounds one side's integral column between two
  * columns of the other side, the join is rewritten to
  *
  *   points + bucket(t div W)   ⋈__bucket   intervals × explode(sequence(lo div W, hi div W))
  *
  * with the ORIGINAL condition re-applied as a post-join filter — the
  * rewrite can only be correct-or-stricter, never wider, because a point's
  * single bucket always lies within its matching interval's bucket range
  * (integral `div` is monotone; see the operator's scaladoc).
  *
  * Conservative by construction. The rule only fires when:
  *  - the conf width is a positive long (off by default);
  *  - the join is INNER with no equality conjunct across sides (if one
  *    exists, Spark already plans a hash join keyed on it);
  *  - the bound column and both bounds are integer/long typed and each
  *    references exactly one, opposite, side.
  * Inverted intervals (hi < lo) stay correct: the descending sequence
  * generates buckets the post-filter then rejects.
  *
  * Registered via [[graft.functions.expressions.GraftExtensions]]
  * (spark.sql.extensions) or `spark.experimental.extraOptimizations`.
  * Caveat shared with the operator: W bounds interval expansion at
  * len/W + 1 rows, so pick W near the median interval length.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Normalize a comparison conjunct to (smaller, larger). */
  private def asBound(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case LessThanOrEqual(a, b) => Some((a, b))
    case _ => None
  }

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.nonEmpty && refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.nonEmpty && refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // A malformed width must degrade to rule-off, not throw inside the
    // optimizer (which would fail EVERY query in the session).
    val raw = conf.getConfString(WidthConf, "0")
    val w = scala.util.Try(raw.trim.toLong).getOrElse {
      logWarning(s"$WidthConf='$raw' is not a long; range-join rewrite disabled")
      0L
    }
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (for (sa <- sideOf(a, left, right); sb <- sideOf(b, left, right))
              yield sa != sb).getOrElse(false)
          case _ => false
        }
        val bounds = conjuncts.flatMap(c => asBound(c).map(c -> _))
        // find p >= lo and p <= hi with the same p on one side, bounds on the other
        val candidate = if (hasEqui) None else (for {
          (_, (lo, p1)) <- bounds // p1 >= lo
          (_, (p2, hi)) <- bounds // p2 <= hi
          if p1.semanticEquals(p2) && isIntegral(p1) && isIntegral(lo) && isIntegral(hi)
          pSide <- sideOf(p1, left, right)
          loSide <- sideOf(lo, left, right)
          hiSide <- sideOf(hi, left, right)
          if loSide == hiSide && loSide != pSide && p1.deterministic &&
            lo.deterministic && hi.deterministic
        } yield (p1, lo, hi, pSide)).headOption
        candidate match {
          case None => j
          case Some((p, lo, hi, pOnLeft)) =>
            val (pointsPlan, intervalsPlan) = if (pOnLeft) (left, right) else (right, left)
            val bucket = Alias(IntegralDivide(asLong(p), Literal(w)), "__graft_pbucket")()
            val points = Project(pointsPlan.output :+ bucket, pointsPlan)
            // Sequence is TimeZoneAwareExpression: it only resolves with a
            // timezone set, even for integral sequences (where it is unused)
            val seq = Sequence(
              IntegralDivide(asLong(lo), Literal(w)),
              IntegralDivide(asLong(hi), Literal(w)),
              None, Some(conf.sessionLocalTimeZone))
            val iBucket = AttributeReference("__graft_ibucket", LongType)()
            val intervals = Generate(Explode(seq), Nil, outer = false, None,
              Seq(iBucket), intervalsPlan)
            val bucketJoin = Join(points, intervals, Inner,
              Some(EqualTo(bucket.toAttribute, iBucket)), hint)
            logInfo(s"RangeJoinRewrite: bucketized range join on $p (width $w)")
            Project(j.output, Filter(cond, bucketJoin))
        }
    }
  }
}
