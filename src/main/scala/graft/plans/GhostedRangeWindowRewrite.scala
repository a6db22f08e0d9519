package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: the ghost-replication rewrite of
  * [[graft.operators.BoundedRangeWindow]] applied TRANSPARENTLY to any
  * eligible trailing-range window in any query — the optimizer-rule rung of
  * the same idea, so a user writing plain
  * `Window.partitionBy(type).orderBy(ts_us).rangeBetween(-r, 0)` gets
  * (keys × buckets)-way parallelism instead of one task per key, without
  * changing a line of query code.
  *
  * Eligibility (everything else is left untouched):
  *   - single ascending LongType sort key (a µs/ms epoch column);
  *   - every window expression is a non-distinct, unfiltered Sum / Count /
  *     Min / Max / Average — functions whose value depends only on the
  *     MULTISET of frame rows, which is exactly what ghost replication
  *     preserves (ranking/offset functions depend on intra-frame position
  *     and are rejected);
  *   - all expressions share one `RANGE BETWEEN r PRECEDING AND CURRENT
  *     ROW` frame with a literal r > 0.
  *
  * Correctness: frames anchored in time-bucket b (width exactly r) reach
  * only buckets b-1 and b; partition (keys, b) holds bucket b's real rows
  * plus bucket b-1's ghosts — each underlying event exactly once — so
  * per-(keys, bucket) frames are content-identical to the global ones.
  * Rows with NULL sort keys are their own peer group and are not ghosted
  * (a ghost would land back in the same null partition and double the
  * group). Bucket = floor(ts / r) is computed in EXACT 64-bit integer
  * arithmetic (truncating `div` with a negative-remainder adjustment) —
  * a double-precision division would misbucket sort keys above 2⁵³
  * (e.g. nanosecond epochs ≈ 1.7·10¹⁸), silently corrupting neighboring
  * frames, so no magnitude guard is needed: every LongType value buckets
  * exactly.
  *
  * Gated off by default (`spark.graft.window.ghostRewrite.enabled`): the
  * rewrite doubles pre-shuffle row volume, a trade that wins when keys ≪
  * cores — the operator form and the t05 gate quantify it (7.9× → 4.8× at
  * ×30). Injected via [[graft.functions.GraftExtensions]]; also usable as
  * `spark.experimental.extraOptimizations`.
  */
object GhostedRangeWindowRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.window.ghostRewrite.enabled"
  private val OwnerCol = "_graft_owner"
  private val GhostCol = "_graft_ghost"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "false").toBoolean) plan
    else plan.transform {
      case w @ Window(wexprs, partSpec, Seq(SortOrder(ts, Ascending, _, _)), child, _)
          if !alreadyRewritten(partSpec) && ts.dataType == LongType &&
            sharedRange(wexprs).isDefined && w.resolved =>
        rewrite(w, ts, sharedRange(wexprs).get, child)
    }

  private def alreadyRewritten(partSpec: Seq[Expression]): Boolean =
    partSpec.exists {
      case a: Attribute => a.name == OwnerCol
      case _ => false
    }

  /** The single literal trailing range all window expressions agree on, if
    * every expression is an eligible multiset aggregate. */
  private def sharedRange(wexprs: Seq[NamedExpression]): Option[Long] = {
    val ranges = wexprs.map {
      case Alias(WindowExpression(ae: AggregateExpression, spec), _)
          if !ae.isDistinct && ae.filter.isEmpty && multisetFn(ae.aggregateFunction) =>
        spec.frameSpecification match {
          case SpecifiedWindowFrame(RangeFrame, Literal(lo: Long, LongType), CurrentRow)
              if lo < 0 => Some(-lo)
          case _ => None
        }
      case _ => None
    }
    if (ranges.nonEmpty && ranges.forall(_.isDefined) && ranges.flatten.distinct.size == 1)
      ranges.head
    else None
  }

  /** Frame-multiset functions only: value independent of intra-frame order. */
  private def multisetFn(f: AggregateFunction): Boolean = f match {
    case _: Sum | _: Count | _: Min | _: Max | _: Average => true
    case _ => false
  }

  private def rewrite(w: Window, ts: Expression, range: Long,
      child: LogicalPlan): LogicalPlan = {
    // Exact integer floor division: Long `div` truncates toward zero, so
    // adjust by one when the remainder is negative (ts < 0 and not on a
    // bucket boundary). NULL ts: every operand is null, so bucket is null
    // (If's predicate is null → else branch → null quotient), matching the
    // null-owner grouping the doc describes.
    val q = IntegralDivide(ts, Literal(range))
    val rem = Remainder(ts, Literal(range))
    val bucket = If(LessThan(rem, Literal(0L)), Subtract(q, Literal(1L)), q)
    val realP = Project(child.output ++ Seq(
      Alias(bucket, OwnerCol)(), Alias(Literal(false), GhostCol)()), child)
    val ghostP = Project(child.output ++ Seq(
      Alias(Add(bucket, Literal(1L)), OwnerCol)(), Alias(Literal(true), GhostCol)()),
      Filter(IsNotNull(ts), child))
    val union = Union(Seq(realP, ghostP))
    val ownerAttr = realP.output.find(_.name == OwnerCol).get
    val ghostAttr = realP.output.find(_.name == GhostCol).get

    // Extend BOTH the node's partition spec and each expression's embedded
    // WindowSpecDefinition; alias exprIds are preserved by transform, so
    // parent references stay valid.
    val newExprs = w.windowExpressions.map(_.transform {
      case spec: WindowSpecDefinition =>
        spec.copy(partitionSpec = spec.partitionSpec :+ ownerAttr)
    }.asInstanceOf[NamedExpression])
    val newWindow = Window(newExprs, w.partitionSpec :+ ownerAttr, w.orderSpec,
      union, w.hint)
    Project(w.output, Filter(Not(ghostAttr), newWindow))
  }
}
