package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: opt-in "approximate mode" for COUNT(DISTINCT).
  *
  * An exact distinct count is one of the most expensive aggregates at
  * 100 TB — every distinct key crosses an exchange (or the planner expands
  * the query with an Expand for multiple distincts). The engine already
  * ships the at-rest HLL operator ([[graft.operators.Sketches.hllDistinct]])
  * for pipeline authors; this rule gives the SAME downgrade to plain SQL /
  * DataFrame `count(distinct x)` call sites — dashboards, data cards,
  * ad-hoc audits — without touching their query text: when
  * `spark.graft.approxDistinct.rsd` is set to a relative standard
  * deviation in (0, 1), every single-argument COUNT(DISTINCT col) in the
  * plan is replaced with HyperLogLogPlusPlus(col, rsd) — Spark's native
  * codegen'd HLL++ aggregate, whose partials are sketch-sized on the
  * exchange regardless of key cardinality.
  *
  * Conservative by construction:
  *  - off unless the conf parses to a double in (0, 1) — a malformed
  *    value logs and disables (the [[RangeJoinRewrite]] contract: a bad
  *    conf must never fail every query in the session);
  *  - only SINGLE-argument distinct counts rewrite — multi-column
  *    `count(distinct a, b)` semantics (null-row dropping across a tuple)
  *    are not HLL-expressible and keep their exact plan;
  *  - FILTER clauses and grouping structure are preserved (only the
  *    aggregate function inside the AggregateExpression is swapped);
  *  - the result type is BIGINT either way, so downstream operators and
  *    schemas are unchanged.
  *
  * This is a deliberate accuracy trade the user opts into per session or
  * per statement (`SET spark.graft.approxDistinct.rsd=0.05`); unset it and
  * plans are byte-identical to stock Spark. Registered alongside
  * [[RangeJoinRewrite]] via [[graft.functions.expressions.GraftExtensions]].
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val RsdConf = "spark.graft.approxDistinct.rsd"

  private def rsd: Double = {
    val raw = conf.getConfString(RsdConf, "")
    if (raw.trim.isEmpty) 0.0
    else scala.util.Try(raw.trim.toDouble).getOrElse {
      logWarning(s"$RsdConf='$raw' is not a double; approx-distinct rewrite disabled")
      0.0
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val r = rsd
    if (r <= 0.0 || r >= 1.0) plan
    else plan.transformUp {
      case a: Aggregate => a.transformExpressions {
        case ae @ AggregateExpression(c: Count, _, true, _, _)
            if c.children.size == 1 =>
          ae.copy(aggregateFunction = HyperLogLogPlusPlus(c.children.head, r),
            isDistinct = false)
      }
    }
  }
}
