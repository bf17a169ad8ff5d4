package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Logical bounded per-key top-k: the whole-operator form of
  * `row_number() OVER (PARTITION BY keys ORDER BY order) <= k`.
  *
  * Output is the child's columns plus `rankAttr` (IntegerType, 1-based
  * within its key by `order`) — exactly the columns the window+filter
  * plan it replaces produces, so the rewrite is a drop-in. Planned by
  * [[TopKStrategy]] into a partial/final exec pair whose state is
  * bounded by keys-per-partition × k ROWS, where the window form must
  * SORT every partition's full key groups first — the difference between
  * a heap problem and a sort problem at 100 TB (same argument as
  * [[graft.functions.RowTopKAggregator]], here as a physical operator
  * that keeps the rows themselves, no struct re-assembly).
  *
  * Tie behavior matches the window form's contract exactly: with a
  * non-total `order`, which of the boundary ties survives is undefined
  * THERE too — callers wanting determinism append a tiebreaker column,
  * same as they must with row_number. */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: Attribute, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def maxRows: Option[Long] = child.maxRows
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Catalyst optimizer rule: rewrite the ubiquitous top-N-per-group idiom
  *
  *   SELECT ... FROM (SELECT *, row_number() OVER
  *     (PARTITION BY key ORDER BY o) AS rn FROM t) WHERE rn <= k
  *
  * into [[TopKPerKey]], whose physical form ([[TopKPerKeyPartialExec]] /
  * [[TopKPerKeyFinalExec]]) prunes to <= k rows per key on the MAP side
  * before the exchange and never sorts a whole partition — `WindowExec`
  * must sort every partition and materialize full key groups before the
  * filter discards all but k rows of each.
  *
  * Conservative and OPT-IN (the [[ApproxDistinctRewrite]] convention):
  * fires only when `spark.graft.topk.rewrite` is `true`, the Window node
  * computes EXACTLY ONE expression — `row_number()` over a non-empty
  * partition spec with a non-empty order — and the filter carries an
  * upper bound `rn <= lit` / `rn < lit` / `rn = lit` with
  * 1 <= bound <= `spark.graft.topk.maxK` (default 10000 — the heap-state
  * guard; a million-row "top-k" belongs to a sort, not a heap). Every
  * other filter conjunct — including the `=` form's exact match — is
  * re-applied ABOVE the rewritten node, so semantics can only shrink,
  * never widen. Registered via
  * [[graft.functions.expressions.GraftExtensions]] together with
  * [[TopKStrategy]] (a rewrite without the strategy would be unplannable;
  * the extension installs both). */
object TopKWindowRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledConf = "spark.graft.topk.rewrite"
  val MaxKConf = "spark.graft.topk.maxK"

  private object UpperBound {
    /** (bound, keepConjunct): the k implied by a conjunct over `rn`. */
    def unapply(e: (Expression, Attribute)): Option[(Int, Boolean)] = e match {
      case (LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)), rn)
        if a.semanticEquals(rn) => Some((v, false))
      case (LessThan(a: Attribute, Literal(v: Int, IntegerType)), rn)
        if a.semanticEquals(rn) => Some((v - 1, false))
      case (GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute), rn)
        if a.semanticEquals(rn) => Some((v, false))
      case (GreaterThan(Literal(v: Int, IntegerType), a: Attribute), rn)
        if a.semanticEquals(rn) => Some((v - 1, false))
      case (EqualTo(a: Attribute, Literal(v: Int, IntegerType)), rn)
        if a.semanticEquals(rn) => Some((v, true))
      case (EqualTo(Literal(v: Int, IntegerType), a: Attribute), rn)
        if a.semanticEquals(rn) => Some((v, true))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledConf, "false").equalsIgnoreCase("true"))
      return plan
    val maxK = try conf.getConfString(MaxKConf, "10000").toInt
      catch { case _: NumberFormatException => 10000 }
    plan.transformUp {
      case f @ Filter(cond, w: Window) if w.windowExpressions.size == 1 &&
          w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
        w.windowExpressions.head match {
          case alias @ Alias(WindowExpression(RowNumber(), _), _) =>
            val rn = alias.toAttribute
            val conjuncts = splitConjunctivePredicates(cond)
            val bound = conjuncts.iterator.map(c => ((c, rn), c)).collectFirst {
              case (UpperBound((b, keep)), c) if b >= 1 && b <= maxK =>
                (c, b, keep)
            }
            bound match {
              case Some((bc, k, keepConjunct)) =>
                val residual = conjuncts.filterNot(_ eq bc) ++
                  (if (keepConjunct) Seq(bc) else Nil)
                // InferWindowGroupLimit (the built-in SPARK-37099 pushdown)
                // has usually already inserted a WindowGroupLimit below
                // this Window; under the heap execs it is pure redundant
                // work (it SORTS each partition to prune), so strip it
                // when it covers our k
                val input = w.child match {
                  case wgl: WindowGroupLimit
                    if wgl.partitionSpec == w.partitionSpec &&
                      wgl.orderSpec == w.orderSpec && wgl.limit >= k =>
                    wgl.child
                  case other => other
                }
                val node = TopKPerKey(w.partitionSpec, w.orderSpec, k, rn, input)
                if (residual.isEmpty) node else Filter(residual.reduce(And), node)
              case None => f
            }
          case _ => f
        }
    }
  }
}
