package graft.plans

import scala.collection.mutable

import graft.functions.DistinctCountAgg
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, ExprId, Expression, NamedExpression, Size, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectSet}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `size(collect_set(x))` → `distinct_count_exact(x)`.
  *
  * The declarative form materializes the full deduplicated ARRAY per group /
  * per window-output-row before taking its length; the imperative aggregate
  * keeps a hash-set buffer and emits only the count — same value (distinct
  * cardinality of non-null inputs; empty input → 0 in both). Registered
  * through `GraftExtensions.injectOptimizerRule` (builder path) or
  * `GraftFunctions.registerOptimizations` (live session), so ANY user query
  * — DataFrame or SQL text — gets the rewrite without opting in; the cast
  * back to Size's IntegerType keeps result schemas unchanged.
  *
  * Two shapes, because the analyzer hoists window aggregates:
  *  - Aggregate: `size(collect_set(x))` appears inline in the agg list;
  *  - Window: the plan is Project[size(_weN)] over Window[_weN =
  *    collect_set(x) OVER spec] — rewritten only when EVERY use of _weN in
  *    the Project is inside size() (otherwise the array itself is needed).
  */
object RewriteSetSize extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a: Aggregate => a.transformExpressions(rewriteInline)
    case p @ Project(fields, w: Window) => rewriteWindow(p, fields, w)
  }

  private def rewritableAgg(ae: AggregateExpression): Option[CollectSet] =
    ae.aggregateFunction match {
      case cs: CollectSet if !ae.isDistinct && ae.filter.isEmpty => Some(cs)
      case _ => None
    }

  private val rewriteInline: PartialFunction[Expression, Expression] = {
    case s @ Size(ae: AggregateExpression, _) if rewritableAgg(ae).isDefined =>
      val cs = rewritableAgg(ae).get
      Cast(ae.copy(aggregateFunction = DistinctCountAgg(cs.child)), s.dataType)
  }

  private def rewriteWindow(p: Project, fields: Seq[NamedExpression],
                            w: Window): LogicalPlan = {
    val cands: Map[ExprId, CollectSet] = w.windowExpressions.collect {
      case a @ Alias(WindowExpression(ae: AggregateExpression, _), _)
          if rewritableAgg(ae).isDefined =>
        a.exprId -> rewritableAgg(ae).get
    }.toMap
    if (cands.isEmpty) return p
    // a candidate is only rewritable if the Project never uses the array
    // itself — every reference must be wrapped in size()
    val usedRaw = mutable.Set[ExprId]()
    def scan(e: Expression): Unit = e match {
      case Size(a: AttributeReference, _) if cands.contains(a.exprId) => ()
      case a: AttributeReference if cands.contains(a.exprId) =>
        usedRaw += a.exprId
      case other => other.children.foreach(scan)
    }
    fields.foreach(scan)
    val doRewrite = cands.keySet -- usedRaw
    if (doRewrite.isEmpty) return p
    val newAttr = mutable.Map[ExprId, Attribute]()
    val newWinExprs = w.windowExpressions.map {
      case a @ Alias(we @ WindowExpression(ae: AggregateExpression, spec), name)
          if doRewrite.contains(a.exprId) =>
        val cs = rewritableAgg(ae).get
        val na = Alias(WindowExpression(
          ae.copy(aggregateFunction = DistinctCountAgg(cs.child)), spec), name)()
        newAttr(a.exprId) = na.toAttribute
        na
      case o => o
    }
    val newFields = fields.map(_.transform {
      case s @ Size(a: AttributeReference, _) if doRewrite.contains(a.exprId) =>
        Cast(newAttr(a.exprId), s.dataType)
    }.asInstanceOf[NamedExpression])
    Project(newFields, Window(newWinExprs, w.partitionSpec, w.orderSpec, w.child))
  }
}
