package graft.plans

import graft.expr.HllSketch
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `count(DISTINCT x)` to the
  * [[HllSketch]] aggregate — the APPROX_COUNT_DISTINCT session dial
  * warehouse engines expose, here as a `Rule[LogicalPlan]` so EXISTING
  * SQL speeds up without edits. Exact distinct on a 100 TB fact means
  * shuffling every distinct value per group (two full exchanges under
  * partial-distinct); the sketch caps the per-group shuffle payload at
  * 2^p bytes with ~1.04/√2^p relative error.
  *
  * Strictly opt-in (`spark.graft.approxCountDistinct.enabled`,
  * default false) because it CHANGES RESULTS — the trade is the
  * caller's to make, per session or per statement (`SET` before/after;
  * the rule reads the conf at optimization time, so it also composes
  * with `spark.sql.optimizer.excludedRules`).
  *
  * Scope guards: only single-argument `count(DISTINCT x)` (multi-arg
  * distinct counts tuples — the sketch hashes one value), FILTER
  * clauses and result ids preserved (the surrounding plan references
  * the same attribute), non-distinct aggregates untouched. */
object ApproxDistinctRule extends Rule[LogicalPlan] {

  val enabledKey = "spark.graft.approxCountDistinct.enabled"
  val precisionKey = "spark.graft.approxCountDistinct.p"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(enabledKey, "false").toBoolean) return plan
    val p = conf.getConfString(precisionKey, "12").toInt
    plan.transformWithSubqueries {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae: AggregateExpression if ae.isDistinct =>
            ae.aggregateFunction match {
              case c: Count if c.children.size == 1 =>
                ae.copy(aggregateFunction = HllSketch(c.children.head, p),
                  isDistinct = false)
              case _ => ae
            }
        }
    }
  }
}
