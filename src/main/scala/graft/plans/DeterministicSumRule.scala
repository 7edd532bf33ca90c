package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Opt-in Catalyst optimizer rule (tier (c) of the extension ladder —
  * injected via [[graft.functions.GraftExtensions]]): rewrite every
  * `sum(double)` / `avg`-free double aggregation into the engine's
  * exact-decimal form
  *
  *   `CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`
  *
  * making any user query's floating aggregates independent of partition
  * count, merge order, AQE re-planning and speculative retries — the
  * determinism contract graft's own declared queries implement by hand
  * (graft.Det), applied automatically to ad-hoc SQL.
  *
  * OFF by default (`spark.graft.deterministicSum=true` to enable): the
  * decimal path trades a few percent of aggregation throughput for
  * bit-stable results, a trade a 1000-executor job often wants and a
  * microbenchmark doesn't.
  */
object DeterministicSumRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.deterministicSum"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "false").toBoolean

  // transformUp, not resolveOperatorsUp: the latter is an analyzer-side
  // combinator that skips plans already marked analyzed — i.e. every plan
  // an optimizer rule sees.
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate if agg.resolved =>
        val rewritten = agg.aggregateExpressions.map(rewriteNamed)
        if (rewritten == agg.aggregateExpressions) agg
        else agg.copy(aggregateExpressions = rewritten)
    }

  // Preserve the original exprId/qualifier/metadata: a fresh Alias would
  // orphan every upstream reference to the rewritten column (filters,
  // sorts, projections above the aggregate would fail to bind).
  private def rewriteNamed(ne: NamedExpression): NamedExpression =
    (ne match {
      case a @ Alias(child, name) =>
        val r = rewrite(child)
        if (r.eq(child)) ne
        else Alias(r, name)(exprId = a.exprId, qualifier = a.qualifier,
          explicitMetadata = a.explicitMetadata)
      case other => other
    }).asInstanceOf[NamedExpression]

  // DECIMAL(38,6): the rule applies to ARBITRARY user queries, so the
  // per-addend cast must not overflow at plausible magnitudes — 38,6
  // holds |x| < 1e32 (an 18,6 cast silently nulled beyond 1e12 in
  // non-ANSI mode). Sum over decimal(38,6) stays decimal(38,6).
  private def rewrite(e: Expression): Expression = e.transformUp {
    case ae @ AggregateExpression(s @ Sum(child, _), _, false, None, _)
        if child.dataType == DoubleType =>
      Cast(
        ae.copy(aggregateFunction =
          s.copy(child = Cast(child, DecimalType(38, 6)))),
        DoubleType)
  }
}
