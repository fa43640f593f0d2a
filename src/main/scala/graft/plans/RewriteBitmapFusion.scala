package graft.plans

import graft.functions.{BitmapAnd, BitmapAndCount, BitmapCount}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `bitmap_count(bitmap_and(a, b))` →
  * `bitmap_and_count(a, b)`.
  *
  * The composed form materializes the intersection as a serialized blob
  * (allocate, AND, trim, serialize) only to popcount it and throw it
  * away; the fused aggregate popcounts the word-wise AND in place —
  * identical result by construction (BitmapCodec.andCardinality is the
  * popcount of the very words BitmapCodec.and would keep; dropped empty
  * pages contribute zero either way).
  *
  * Deliberately shallow: only the exact count-of-AND pattern fuses.
  * `bitmap_and(bitmap_and(a,b),c)` chains stay materialized except the
  * OUTERMOST count — `bitmap_count(bitmap_and(bitmap_and(a,b),c))`
  * becomes `bitmap_and_count(bitmap_and(a,b), c)`, which is exactly the
  * n-way evaluation you'd hand-write.
  *
  * Registered alongside [[RewriteDotProduct]]/[[RewriteSetSize]] via
  * `GraftExtensions` and `GraftFunctions.registerOptimizations`.
  */
object RewriteBitmapFusion extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case BitmapCount(BitmapAnd(a, b)) => BitmapAndCount(a, b)
    }
}
