package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, max, percentile_approx, lit}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Automatic bin-and-verify rewrite for inequality-only range joins —
  * the optimizer-rule twin of [[graft.operators.RangeJoin]].
  *
  * An inner join whose condition is only `t ≥ lo AND t ≤ hi` (one side's
  * instant inside the other side's interval, long-typed — the engine's
  * ns-epoch discipline) has no equi key, so Spark plans
  * BroadcastNestedLoopJoin: quadratic work plus a full-side broadcast, a
  * non-starter at 100 TB. This rule quantizes the time axis: the interval
  * side explodes to its covered bins (a `Generate` of the bin
  * `Sequence`), the instant side projects its single bin, and the join
  * becomes a hash equi-join on the bin with the ORIGINAL condition
  * re-verified — identical semantics (a qualifying pair always meets in
  * the instant's bin; strict bounds and reversed/empty intervals are
  * handled by the re-check), hash shuffle instead of a nested loop.
  *
  * Bin width: `spark.graft.rangeJoin.binWidth` accepts a positive long
  * (time units of the join columns), `off` (or any value ≤ 0) to disable
  * the rewrite, or `auto` — the default when unset. Auto derives the
  * width at rewrite time from one narrow aggregation over the interval
  * side (approximate p95 of `hi − lo`: ≤2-row fanout for a typical
  * interval; exact max: the width is floored so the longest interval IN
  * THE DATA explodes to at most [[MaxFanout]] bins) — a session-global
  * width can't fit every join, so each join derives its own. If the
  * side is empty or the probe fails, the join is left unrewritten.
  *
  * The rewrite only fires when no equi conjunct exists (Spark already
  * hash-joins those, with the range conjuncts as post-join filters) and
  * both range conjuncts bound the SAME instant expression. Registered
  * via `GraftExtensions`. */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private val WidthKey = "spark.graft.rangeJoin.binWidth"
  private val SampleRows = 10000
  private val MaxFanout = 4096L

  /** Memoized derived widths, keyed by the CANONICALIZED probe plan
    * (`Project(hi − lo, intervalSide)` — canonicalization normalizes
    * expr-ids, so re-analyzed copies of the same join shape share a
    * key). Every DataFrame ACTION re-plans (a noop write builds a fresh
    * QueryExecution), so without the cache a serving loop re-runs the
    * p95+max aggregation job once per action — pure planning-time waste
    * (the same property that made r14's scoped-registration bench time
    * an un-rescued plan). Bounded LRU (the plan-tree keys can
    * transitively pin relation metadata, so the bound matters) AND
    * TTL-expired ([[WidthTtlKey]]): a mutable-source interval side
    * (catalog/JDBC relation) keeps a STABLE canonicalized plan across
    * data growth — unlike file relations, whose FileIndex identity
    * changes — and the exact-max floor exists precisely to bound a
    * later long-outlier interval's Sequence explosion, so an entry
    * must not outlive the data distribution it measured. A stale width
    * within the TTL costs fanout up to [[MaxFanout]] (the original
    * join condition is always re-verified, so never correctness);
    * expiry costs one trivial re-probe aggregation. Writers that
    * materially change interval distributions can still clear eagerly
    * via [[clearWidthCache]]. Thread-safe via synchronized access
    * (plan rewrites are driver-side and rare). */
  private val WidthCacheMax = 64
  private val WidthTtlKey = "spark.graft.rangeJoin.widthCacheTtlMs"
  private val WidthTtlDefaultMs = 600000L // 10 min
  private val widthCache =
    new java.util.LinkedHashMap[LogicalPlan, (Option[Long], Long)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[LogicalPlan, (Option[Long], Long)]): Boolean =
        size() > WidthCacheMax
    }

  private def widthTtlMs: Long =
    try conf.getConfString(WidthTtlKey, WidthTtlDefaultMs.toString).toLong
    catch { case _: NumberFormatException => WidthTtlDefaultMs }

  def clearWidthCache(): Unit = widthCache.synchronized(widthCache.clear())

  /** Probe executions actually run (test seam — specs pin one derivation
    * per distinct join shape across repeated plannings). */
  private[graft] val probeRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  /** None → auto-derive per join; Some(w>0) → fixed width; Some(0) → off. */
  private def configuredWidth: Option[Long] =
    conf.getConfString(WidthKey, "auto").trim.toLowerCase match {
      case "auto" | "" => None
      case "off" => Some(0L)
      case s => try Some(math.max(s.toLong, 0L)) catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$WidthKey must be a positive long (bin width in the time " +
            s"columns' units), 'auto', or 'off'; got '$s'")
      }
    }

  /** Statistics probe over the interval side: approximate p95 (sets the
    * typical ≤2-bin fanout) and EXACT max (the safety floor: the width
    * is raised until the longest interval in the data — not just the
    * longest sampled one — explodes to at most [[MaxFanout]] bins) of
    * `hi − lo`. One narrow aggregation pass over a single derived
    * column, run as its own job mid-optimization (the probe plan has no
    * join, so the rule cannot re-enter itself through it). The max must
    * be exact: with a row-limited sample, one unsampled outlier
    * interval (bad data, a years-long span in an ns-unit column) would
    * explode its `Sequence` past the array limit and fail a query that
    * used to run — the full-pass max trades one planning-time column
    * scan for that never happening. */
  private def deriveWidth(ival: LogicalPlan, lo: Expression,
      hi: Expression): Option[Long] = try {
    val len = Alias(Subtract(hi, lo), "__graft_len")()
    val probePlan = Project(Seq(len), ival)
    val key = probePlan.canonicalized
    val ttl = widthTtlMs
    val now = System.currentTimeMillis()
    val cached = widthCache.synchronized(Option(widthCache.get(key)))
      .collect { case (w, at) if ttl <= 0 || now - at < ttl => w }
    cached.getOrElse {
      probeRuns.incrementAndGet()
      val spark = SparkSession.active
      val probe = ColumnBridge.ofRows(spark, probePlan)
      val row = probe.agg(
        percentile_approx(col("__graft_len"), lit(0.95), lit(SampleRows))
          .cast("long").as("p95"),
        max(col("__graft_len")).cast("long").as("mx")).head()
      val w =
        if (row.isNullAt(0)) None
        else {
          val p95 = math.max(row.getLong(0), 1L)
          val mx = math.max(if (row.isNullAt(1)) p95 else row.getLong(1), p95)
          val dw = math.max(p95, (mx + MaxFanout - 1) / MaxFanout)
          logInfo(s"derived $WidthKey=$dw (p95 len=$p95, exact max len=$mx)")
          Some(dw)
        }
      // a None (empty interval side) is NOT cached: the side may fill
      // up later, and re-probing an empty side is a trivial agg
      if (w.isDefined) widthCache.synchronized(widthCache.put(key, (w, now)))
      w
    }
  } catch {
    case scala.util.control.NonFatal(e) =>
      logWarning(s"auto bin-width probe failed; leaving join unrewritten", e)
      None
  }

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
    val cw = configuredWidth
    if (cw.contains(0L)) return plan
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
          match_.flatMap { case (t, lo, hi, tLeft) =>
            val (instSide, ivalSide) = if (tLeft) (l, r) else (r, l)
            cw.orElse(deriveWidth(ivalSide, lo, hi)).map { w =>
              // interval side: explode covered bins
              val binsAttr = AttributeReference("__graft_bin", LongType,
                nullable = false)()
              // TimeZoneAwareExpression: unresolved until a zone is bound,
              // even for integral sequences. The stop is clamped to
              // >= start: a REVERSED interval (hi < lo — it matches
              // nothing, the re-verify guarantees that) would otherwise
              // make Sequence count DOWNWARD through every bin between,
              // an unbounded explode for wide reversals
              val binLo = bin(lo, w)
              val seq = Sequence(binLo,
                Greatest(Seq(binLo, bin(hi, w))), None,
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
        }
        rewritten.getOrElse(j)
    }
  }
}
