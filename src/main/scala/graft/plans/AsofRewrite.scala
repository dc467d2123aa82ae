package graft.plans

import scala.util.Try

import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, EqualTo, Expression, Literal, NamedExpression, NullsFirst, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.{CurrentRow, RangeFrame, RowFrame, SpecifiedWindowFrame, UnboundedPreceding}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Last}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Union, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: recognize the composed union+window as-of idiom and
  * rewrite it to the native [[AsofJoinPlan]] — existing SQL/DataFrame
  * users of the pattern get the one-candidate merge (no union superset,
  * no window sort buffer carrying payloads) for free.
  *
  * The idiom (q26's shape — how as-of is written when the engine lacks
  * the operator):
  *
  * {{{
  *   ref.select(key, at, payload, lit(0) as flag, lit(null) as ...)
  *     .unionByName(events.select(key, at, lit(null) as payload, lit(1) as flag, ...))
  *     .withColumn(asof, last(payload, ignoreNulls = true)
  *       .over(Window.partitionBy(key).orderBy(at, flag, ...)
  *         .rowsBetween(unboundedPreceding, currentRow)))
  *     .filter(flag === 1)
  * }}}
  *
  * Match conditions (all REQUIRED; anything else leaves the plan
  * untouched):
  *   - Filter(flag = 1) directly over the Window (the flag is not a
  *     partition column, so no optimizer rule moves the filter below);
  *   - exactly ONE window expression: last(payload, ignoreNulls) over
  *     partitionBy(key), orderBy(at ASC NULLS FIRST, flag ASC, ...) with
  *     an UNBOUNDED PRECEDING .. CURRENT ROW frame (ROWS or RANGE: the
  *     flag column makes ref rows non-peers of event rows, so both
  *     frames see the same ref prefix);
  *   - the window child is a two-sided union (optionally through a
  *     column-pruning Project) whose sides mark the flag with literal
  *     0 (reference) / 1 (event), and the event side's payload is a
  *     null literal (so `last` can only pick reference payloads);
  *   - key/time types the native merge supports (integral/string key,
  *     integral-backed time).
  *
  * The rewrite plans AsofJoinPlan in `nullsAsValues` mode — the window
  * form's exact null semantics (partitionBy groups NULL keys; ASC sort
  * puts NULL times first = -infinity), so the rewrite is
  * semantics-preserving on all inputs, nulls included. A trailing
  * Project re-exposes the Filter's original output attributes (same
  * exprIds), leaving every parent operator untouched.
  *
  * Disable with `spark.graft.asofRewrite.enabled=false` (used by specs
  * that must measure the composed form itself).
  */
object AsofRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.asofRewrite.enabled", "true").toBoolean) plan
    else plan.transformUp {
      case f @ Filter(cond, child) =>
        flagOf(cond).flatMap(rewrite(f, _, child)).getOrElse(f)
    }

  private def flagOf(cond: Expression): Option[Attribute] = cond match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) => Some(a)
    case EqualTo(Literal(1, IntegerType), a: Attribute) => Some(a)
    case _ => None
  }

  private def unalias(e: Expression): Expression = e match {
    case Alias(c, _) => unalias(c)
    case other => other
  }

  /** The frame must cover exactly the at-or-before prefix. */
  private def prefixFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow) => true
      case _ => false
    }

  private def rewrite(f: Filter, flag: Attribute,
                      child: LogicalPlan): Option[LogicalPlan] = {
    // Filter directly on the Window (the optimizer can't push a
    // non-partition-column filter below it, and any Project lands ABOVE
    // the filter after collapse — so this is the stable optimized shape)
    val wnd = child match {
      case w: Window => w
      case _ => return None
    }
    // exactly one window expression: last(payload, ignoreNulls = true)
    val (asofAttr, payload, spec) = wnd.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(AggregateExpression(
          Last(p: Attribute, true), _, _, _, _), s: WindowSpecDefinition), _)) =>
        (a.toAttribute, p, s)
      case _ => return None
    }
    if (!prefixFrame(spec)) return None
    // partitionBy(key); orderBy(at ASC NULLS FIRST, flag ASC, ...)
    val key = spec.partitionSpec match {
      case Seq(k: Attribute) => k
      case _ => return None
    }
    val at = spec.orderSpec match {
      case Seq(SortOrder(a: Attribute, Ascending, NullsFirst, _),
               SortOrder(fl: Attribute, Ascending, _, _), _*)
          if fl.exprId == flag.exprId => a
      case _ => return None
    }
    // the window child is the two-sided union (optionally through a
    // column-pruning Project — attrs keep their exprIds, so indices into
    // union.output stay valid)
    val union = wnd.child match {
      case u: Union => u
      case Project(list, u: Union) if list.forall(_.isInstanceOf[Attribute]) => u
      case _ => return None
    }
    // a side is any node with an inspectable output-expression list — a
    // Project, or an Aggregate the optimizer collapsed the literal
    // projection into (q26's deduped reference side)
    def sideList(p: LogicalPlan): Option[Seq[NamedExpression]] = p match {
      case Project(list, _) => Some(list)
      case a: Aggregate => Some(a.aggregateExpressions)
      case _ => None
    }
    val (sideA, sideB) = union.children match {
      case Seq(a, b) if sideList(a).isDefined && sideList(b).isDefined => (a, b)
      case _ => return None
    }
    def idxOf(a: Attribute): Int = union.output.indexWhere(_.exprId == a.exprId)
    val keyIdx = idxOf(key); val atIdx = idxOf(at)
    val payIdx = idxOf(payload); val flagIdx = idxOf(flag)
    if (Seq(keyIdx, atIdx, payIdx, flagIdx).exists(_ < 0) ||
      Seq(keyIdx, atIdx, payIdx, flagIdx).distinct.size != 4) return None
    // classify sides by the flag literal; events carry a NULL payload
    def flagLit(p: LogicalPlan): Option[Int] =
      unalias(sideList(p).get(flagIdx)) match {
        case Literal(v: Int, IntegerType) => Some(v)
        case _ => None
      }
    val (refSide, evtSide) = (flagLit(sideA), flagLit(sideB)) match {
      case (Some(0), Some(1)) => (sideA, sideB)
      case (Some(1), Some(0)) => (sideB, sideA)
      case _ => return None
    }
    unalias(sideList(evtSide).get(payIdx)) match {
      case Literal(null, _) => ()
      case _ => return None
    }
    // self-union guard: both sides resolving to the same exprIds would
    // make the output projection ambiguous
    val evtIds = evtSide.output.map(_.exprId).toSet
    if (refSide.output.exists(a => evtIds.contains(a.exprId))) return None

    val refK = refSide.output(keyIdx); val refT = refSide.output(atIdx)
    val refP = refSide.output(payIdx)
    val evtK = evtSide.output(keyIdx); val evtT = evtSide.output(atIdx)
    Try {
      val native = AsofJoinPlan(
        evtSide, Project(Seq(refK, refT, refP), refSide),
        evtK, evtT, refK, refT, Seq(refP), nullsAsValues = true)
      val nativePayload = native.output.last
      // re-expose the Filter's exact output attributes: surviving rows
      // are precisely the event side, so union column i = event column i
      val out: Seq[NamedExpression] = f.output.map { a =>
        if (a.exprId == asofAttr.exprId)
          Alias(nativePayload, a.name)(exprId = a.exprId)
        else {
          val i = idxOf(a)
          if (i < 0) return None
          val src = evtSide.output(i)
          if (src.exprId == a.exprId) src
          else Alias(src, a.name)(exprId = a.exprId)
        }
      }
      Project(out, native)
    }.toOption
  }
}
