package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous per-group top-k idiom
  *
  *   Filter(rn <= k, Window(row_number() over (partition, order) AS rn))
  *
  * into the GroupedTopK custom operator, whose exec keeps one
  * k-bounded heap per group instead of sorting every group's full row
  * set. The rewritten node reuses the window alias's exprId, so every
  * downstream reference to the rank column stays resolved. Injected
  * via GraftExtensions; validated by the DuckDB oracles of every
  * rank-filter query it fires on (window_rank, topk_cosine, q3-style
  * rankings) — the rewrite is semantics-preserving for exactly the
  * matched shape:
  *  - a single window expression that is a plain row_number()
  *  - the filter condition is ONLY the rank bound (no conjunctions)
  *  - bound forms: rn <= k, rn < k, k >= rn, k > rn, rn = 1
  */
object RankLimitToGroupedTopK extends Rule[LogicalPlan] {

  private def bound(cond: Expression, rank: Attribute): Option[Int] = {
    def isRank(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == rank.exprId
      case _ => false
    }
    cond match {
      case LessThanOrEqual(e, IntegerLiteral(k)) if isRank(e) => Some(k)
      case LessThan(e, IntegerLiteral(k)) if isRank(e) => Some(k - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), e) if isRank(e) => Some(k)
      case GreaterThan(IntegerLiteral(k), e) if isRank(e) => Some(k - 1)
      case EqualTo(e, IntegerLiteral(1)) if isRank(e) => Some(1)
      case EqualTo(IntegerLiteral(1), e) if isRank(e) => Some(1)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order, _)), _)), _, _, child, _))
        if order.nonEmpty =>
      bound(cond, a.toAttribute) match {
        case Some(k) if k > 0 =>
          // keep the alias's exprId AND dataType (row_number is
          // IntegerType) so downstream references stay resolved
          GroupedTopK(part, order, k,
            AttributeReference(a.name, a.dataType,
              nullable = false)(exprId = a.exprId),
            child)
        case Some(_) => f // k <= 0: empty result, leave to the filter
        case None => f
      }
  }
}
