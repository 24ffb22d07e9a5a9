package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, LongType, TimestampNTZType, TimestampType}

/** Restores parquet predicate pushdown through the ns-epoch view of a
  * microsecond timestamp column.
  *
  * `Tables.load` normalizes a timestamp-typed `events.ts` to the engine's
  * ns-epoch long as `unix_micros(ts) * 1000` — after which a time-range
  * filter compares against a COMPUTED column and never reaches the scan:
  * the parquet reader sees no `PushedFilters`, row-group min/max pruning
  * is lost, and a 100 TB scan reads everything to serve a one-day range.
  * The conversion is strictly monotonic integer arithmetic, so every
  * comparison has an exact inverse image; this rule rewrites
  * `unix_micros(ts)·1000 ⋈ L` to `ts ⋈ ⌈L/1000⌉|⌊L/1000⌋` (direction per
  * operator), landing the predicate on the scanned attribute where
  * `FileSourceStrategy` turns it into a pushed parquet filter.
  *
  * Runs in the user-optimizer batch — after `PushDownPredicates` has
  * substituted the projection alias, so the matched expression sits
  * directly above the relation. Naive-as-UTC (TIMESTAMP_NTZ) casts are
  * only unwrapped when the session clock IS UTC (`Tables.load` pins it);
  * under any other zone the rule leaves the plan untouched rather than
  * shift the boundary. Registered per-session by `Tables.load` and via
  * `GraftExtensions` for `spark.sql.extensions` deployments.
  */
object TsPushdown extends Rule[LogicalPlan] {

  /** Matches the normalized view `unix_micros(cast?(t)) * 1000` and
    * returns the underlying timestamp-typed expression (an attribute
    * once predicate pushdown has substituted the alias). */
  private object NsView {
    private def base(e: Expression): Option[Expression] = e match {
      case c: Cast if c.dataType == TimestampType &&
        c.child.dataType == TimestampNTZType => Some(c.child)
      case t if t.dataType == TimestampType => Some(t)
      case _ => None
    }
    def unapply(e: Expression): Option[Expression] = e match {
      case Multiply(UnixMicros(inner), Literal(1000L, LongType), _) => base(inner)
      case Multiply(Literal(1000L, LongType), UnixMicros(inner), _) => base(inner)
      case _ => None
    }
  }

  private def floorDiv(x: Long): Long = Math.floorDiv(x, 1000L)
  private def ceilDiv(x: Long): Long = -Math.floorDiv(-x, 1000L)

  /** No ns value off the 1000-grid has a µs preimage, but the original
    * comparison is three-valued: NULL when `t` is NULL, FALSE otherwise.
    * A bare FALSE would flip NULL→FALSE under negation or in projection
    * context, so preserve the null branch unless `t` is non-nullable. */
  private def noPreimage(t: Expression): Expression =
    if (t.nullable) If(IsNull(t), Literal(null, BooleanType), Literal.FalseLiteral)
    else Literal.FalseLiteral

  /** Micros literal in the matched expression's own timestamp type (both
    * timestamp types store micros-since-epoch internally). */
  private def usLit(us: Long, like: Expression): Literal =
    Literal(us, like.dataType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.sessionLocalTimeZone != "UTC") plan
    else plan.transformAllExpressions {
      // t·1000 ⋈ v
      case GreaterThanOrEqual(NsView(t), Literal(v: Long, LongType)) =>
        GreaterThanOrEqual(t, usLit(ceilDiv(v), t))
      case GreaterThan(NsView(t), Literal(v: Long, LongType)) =>
        GreaterThan(t, usLit(floorDiv(v), t))
      case LessThanOrEqual(NsView(t), Literal(v: Long, LongType)) =>
        LessThanOrEqual(t, usLit(floorDiv(v), t))
      case LessThan(NsView(t), Literal(v: Long, LongType)) =>
        LessThan(t, usLit(ceilDiv(v), t))
      case EqualTo(NsView(t), Literal(v: Long, LongType)) =>
        if (v % 1000L == 0L) EqualTo(t, usLit(v / 1000L, t))
        else noPreimage(t)
      // v ⋈ t·1000 (mirrored)
      case GreaterThanOrEqual(Literal(v: Long, LongType), NsView(t)) =>
        GreaterThanOrEqual(usLit(floorDiv(v), t), t)
      case GreaterThan(Literal(v: Long, LongType), NsView(t)) =>
        GreaterThan(usLit(ceilDiv(v), t), t)
      case LessThanOrEqual(Literal(v: Long, LongType), NsView(t)) =>
        LessThanOrEqual(usLit(ceilDiv(v), t), t)
      case LessThan(Literal(v: Long, LongType), NsView(t)) =>
        LessThan(usLit(floorDiv(v), t), t)
      case EqualTo(Literal(v: Long, LongType), NsView(t)) =>
        if (v % 1000L == 0L) EqualTo(usLit(v / 1000L, t), t)
        else noPreimage(t)
      // t·1000 IN (v…): non-multiples of 1000 have no preimage
      case In(NsView(t), vs) if vs.forall {
          case Literal(_: Long, LongType) => true; case _ => false } =>
        val us = vs.collect { case Literal(v: Long, LongType) if v % 1000L == 0L =>
          usLit(v / 1000L, t) }
        if (us.isEmpty) noPreimage(t) else In(t, us)
      // OptimizeIn rewrites long IN lists to InSet before this batch runs
      case InSet(NsView(t), hset) if hset.forall(_.isInstanceOf[java.lang.Long]) =>
        val us = hset.collect {
          case v: java.lang.Long if v.longValue % 1000L == 0L =>
            java.lang.Long.valueOf(v.longValue / 1000L): Any }
        if (us.isEmpty) noPreimage(t) else InSet(t, us)
    }
}
