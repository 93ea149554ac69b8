package graft.plans

import org.apache.spark.sql.catalyst.expressions.{IsNotNull, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{BigramArray, CharGramArray, ShingleArray}

/** Optimizer rule: null checks over the total text kernels reduce to
  * null checks on their INPUT.
  *
  * Why it exists: Catalyst's constraint inference materializes
  * `isnotnull(shinglearray(text))` (or `isnotnull(size(...))`) from
  * join/filter constraints and pushes it into the parquet scan's data
  * filters — re-evaluating the most expensive expression in the
  * pipeline once per scanned row, before the projection that was
  * supposed to run it once (observed in round 2 on the dedup family;
  * worked around per-query with a null-TOLERANT `coalesce` threshold).
  * The kernels are TOTAL: for a non-null input they never return null,
  * so `IsNotNull(kernel(x)) ≡ IsNotNull(x)` and
  * `IsNotNull(Size(kernel(x))) ≡ IsNotNull(x)` — this rule applies
  * that identity everywhere, turning the inferred scan filter into a
  * cheap null probe of the underlying column.
  *
  * The per-query `coalesce` guards stay (they also stop the constraint
  * from EXISTING); this rule is the principled backstop for future
  * queries that forget the idiom. Injected via
  * `spark.sql.extensions=graft.plans.GraftExtensions`
  * (injectOptimizerRule) or at runtime through
  * `spark.experimental.extraOptimizations`.
  */
object KernelNullRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case IsNotNull(k: ShingleArray) => IsNotNull(k.child)
      case IsNotNull(k: CharGramArray) => IsNotNull(k.child)
      case IsNotNull(k: BigramArray) => IsNotNull(k.child)
      case IsNotNull(Size(k: ShingleArray, _)) => IsNotNull(k.child)
      case IsNotNull(Size(k: CharGramArray, _)) => IsNotNull(k.child)
      case IsNotNull(Size(k: BigramArray, _)) => IsNotNull(k.child)
    }
}
