package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Automatic bin-and-verify rewrite for inequality-only range joins —
  * the optimizer-rule twin of [[graft.operators.RangeJoin]].
  *
  * An inner join whose condition is only `t ≥ lo AND t ≤ hi` (one side's
  * instant inside the other side's interval, long-typed — the engine's
  * ns-epoch discipline) has no equi key, so Spark plans
  * BroadcastNestedLoopJoin: quadratic work plus a full-side broadcast, a
  * non-starter at 100 TB. When `spark.graft.rangeJoin.binWidth` is set
  * (> 0, same units as the time columns), this rule quantizes the time
  * axis: the interval side explodes to its covered bins (a `Generate` of
  * the bin `Sequence`), the instant side projects its single bin, and
  * the join becomes a hash equi-join on the bin with the ORIGINAL
  * condition re-verified — identical semantics (a qualifying pair always
  * meets in the instant's bin; strict bounds and reversed/empty
  * intervals are handled by the re-check), hash shuffle instead of a
  * nested loop.
  *
  * The rewrite only fires when no equi conjunct exists (Spark already
  * hash-joins those, with the range conjuncts as post-join filters) and
  * both range conjuncts bound the SAME instant expression. Registered
  * via `GraftExtensions`; width choice is the operator's contract: pick
  * the typical interval length (fanout ⌈len/W⌉+1 per interval row). */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private val WidthKey = "spark.graft.rangeJoin.binWidth"

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** (instant t, bound b, t-side-is-left, inclusive) for `t ≥/>` lower
    * bounds and `t ≤/<` upper bounds, both literal orientations. */
  private def lower(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(t, b) => Some((t, b))
    case GreaterThan(t, b) => Some((t, b))
    case LessThanOrEqual(b, t) => Some((t, b))
    case LessThan(b, t) => Some((t, b))
    case _ => None
  }
  private def upper(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(t, b) => Some((t, b))
    case LessThan(t, b) => Some((t, b))
    case GreaterThanOrEqual(b, t) => Some((t, b))
    case GreaterThan(b, t) => Some((t, b))
    case _ => None
  }

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  private def isEquiKey(e: Expression, l: LogicalPlan, r: LogicalPlan): Boolean = e match {
    case EqualTo(a, b) =>
      (sideOf(a, l, r), sideOf(b, l, r)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
    case EqualNullSafe(a, b) =>
      (sideOf(a, l, r), sideOf(b, l, r)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
    case _ => false
  }

  private def bin(c: Expression, w: Long): Expression =
    IntegralDivide(Subtract(c, Pmod(c, Literal(w))), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(WidthKey, "0").toLong
    if (w <= 0) return plan
    plan transform {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        val conjuncts = splitConjuncts(cond)
        val rewritten = if (conjuncts.exists(isEquiKey(_, l, r))) None else {
          // find a lower and an upper bound on the SAME instant, with the
          // instant's references on one side and both bounds' on the other
          val lowers = conjuncts.flatMap(c => lower(c).map(c -> _))
          val uppers = conjuncts.flatMap(c => upper(c).map(c -> _))
          val match_ = (for {
            (lc, (t1, lo)) <- lowers
            (uc, (t2, hi)) <- uppers
            if lc != uc && t1.semanticEquals(t2) && t1.dataType == LongType
            tSide <- sideOf(t1, l, r)
            loSide <- sideOf(lo, l, r)
            hiSide <- sideOf(hi, l, r)
            if loSide == hiSide && loSide != tSide
          } yield (t1, lo, hi, tSide)).headOption
          match_.map { case (t, lo, hi, tLeft) =>
            val (instSide, ivalSide) = if (tLeft) (l, r) else (r, l)
            // interval side: explode covered bins
            val binsAttr = AttributeReference("__graft_bin", LongType,
              nullable = false)()
            // TimeZoneAwareExpression: unresolved until a zone is bound,
            // even for integral sequences
            val seq = Sequence(bin(lo, w), bin(hi, w), None,
              Some(conf.sessionLocalTimeZone))
            val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(binsAttr), child = ivalSide)
            // instant side: single bin projection
            val tBin = Alias(bin(t, w), "__graft_tbin")()
            val proj = Project(instSide.output :+ tBin, instSide)
            val equi = EqualTo(binsAttr, tBin.toAttribute)
            val (nl, nr) = if (tLeft) (proj, gen) else (gen, proj)
            Project(j.output,
              Join(nl, nr, Inner, Some(And(equi, cond)), hint))
          }
        }
        rewritten.getOrElse(j)
    }
  }
}
