package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling z-score anomaly scoring — the streaming twin of
  * [[graft.tsdb.TsAnalytics.rollingZScore]], and the continuous version
  * of the reference's threshold outlier-detector hook
  * (`hooks/listeners/outlier_detector.go` scores each PUT as it lands;
  * here the baseline is a trailing window instead of a fixed band).
  *
  * State per live series is ONE ring of the trailing `lookback` values —
  * bounded by (live series × lookback), independent of feed volume or
  * history length. Series idle past `idleExpiry` (event time) drop their
  * state entirely and re-warm on return, the same bounded-state contract
  * as [[StreamingDedup]]: a monitoring fleet churning hosts never
  * accumulates dead series.
  *
  * Contract parity with the batch operator, for in-order feeds: each
  * point is scored against the `lookback` points BEFORE it (self
  * excluded), only once `minPoints` predecessors exist and the trailing
  * sample stddev is non-degenerate. Rows inside one micro-batch are
  * processed in event-time order; a late row that crosses micro-batches
  * is scored against the state at arrival (at-arrival semantics — the
  * batch twin, re-run over the settled table, is the source of truth,
  * the standard lambda split this library uses for streaming twins). */
object StreamingAnomaly {

  case class Scored(series_key: String, ts: Timestamp, value: Double,
      mean: Option[Double], stddev: Option[Double], z: Option[Double],
      is_anomaly: Boolean)

  /** Trailing ring, oldest first, capped at lookback. */
  case class Ring(vals: Vector[Double])

  case class Smoothed(series_key: String, ts: Timestamp, value: Double,
      level: Double, trend: Double, forecast: Double)

  /** Holt level/trend state per live series. */
  case class LT(level: Double, trend: Double)

  /** Streaming Holt linear-trend smoothing — the streaming twin of
    * [[graft.tsdb.TsAnalytics.holtSmooth]]. State per live series is TWO
    * doubles (level, trend) — the smallest possible stateful-stream
    * footprint, bounded by live series alone — with the same event-time
    * idle expiry as [[score]]. Contract parity with the batch operator
    * for in-order feeds: identical recurrence
    * (`l' = α·v + (1−α)(l+b)`, `b' = β(l'−l) + (1−β)b`, seeded l=v, b=0),
    * identical IEEE order, so values match bit-for-bit. */
  def smooth(points: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, alpha: Double, beta: Double,
      lateness: String = "10 minutes",
      idleExpiry: String = "1 hour"): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1,
      s"alpha/beta must be in (0, 1], got $alpha/$beta")
    val spark = points.sparkSession
    import spark.implicits._
    val ds = points
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("t"),
        col(valueCol).cast("double").as("v"))
      .withWatermark("t", lateness)
      .as[(String, Timestamp, Double)]
    implicit val ltEnc = Encoders.product[LT]
    implicit val outEnc = Encoders.product[Smoothed]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[LT, Smoothed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Timestamp, Double)],
            state: GroupState[LT]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.orNull
            val batch = rows.toIndexedSeq.sortBy(_._2.getTime)
            val out = batch.map { case (_, t, v) =>
              st =
                if (st == null) LT(v, 0.0)
                else {
                  val nl = alpha * v + (1 - alpha) * (st.level + st.trend)
                  LT(nl, beta * (nl - st.level) + (1 - beta) * st.trend)
                }
              Smoothed(key, t, v, st.level, st.trend, st.level + st.trend)
            }
            state.update(st)
            state.setTimeoutTimestamp(batch.last._2.getTime, idleExpiry)
            out.iterator
          }
      }.toDF()
  }

  case class Rated(series_key: String, ts: Timestamp, value: Double,
      delta: Double, rate_per_sec: Double)

  /** Last observed (event-time ms, value) per live series. */
  case class LastPt(tMs: Long, v: Double)

  case class DeltaRow(series_key: String, ts: Timestamp, value: Double,
      n_points: Long, delta: Double, increase: Double)

  case class TrendRow(series_key: String, ts: Timestamp, value: Double,
      n_points: Long, slope_per_sec: Option[Double], predicted: Option[Double])

  /** Running least-squares state: moment sums over (t_sec − t₀, v) with
    * t₀ = the series' first event time (conditioning anchor), plus the
    * last (ts ms, value) — O(1) per live series. */
  case class TrendSt(t0Ms: Long, n: Long, st: Double, sv: Double,
      stv: Double, stt: Double, tMs: Long, v: Double)

  /** Streaming linear trend + horizon forecast — the streaming twin of
    * [[graft.tsdb.TsAnalytics.predictLinear]]: each arriving point
    * updates the series' running moment sums (O(1) state, no window) and
    * emits the current slope and the value forecast `horizon` past the
    * point. Slope needs ≥ 2 points and positive time variance (else
    * None). After an in-order prefix, the last emitted row per series
    * matches the batch operator within FP re-association (the batch
    * anchors t at the query start, this anchors at the series' first
    * point — slope/forecast are origin-invariant). Late rows (at or
    * before the last event time) are dropped, like [[rate]]. */
  def trend(points: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, horizonSec: Double = 3600.0,
      lateness: String = "10 minutes",
      idleExpiry: String = "1 hour"): DataFrame = {
    require(horizonSec >= 0, "horizon must be non-negative")
    val spark = points.sparkSession
    import spark.implicits._
    val ds = points
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("t"),
        col(valueCol).cast("double").as("v"))
      .withWatermark("t", lateness)
      .as[(String, Timestamp, Double)]
    implicit val stEnc = Encoders.product[TrendSt]
    implicit val rowEnc = Encoders.product[TrendRow]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[TrendSt, TrendRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Timestamp, Double)],
            state: GroupState[TrendSt]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.orNull
            val batch = rows.toIndexedSeq.sortBy(_._2.getTime)
            val out = batch.flatMap { case (_, ts, v) =>
              val tMs = ts.getTime
              if (st != null && tMs <= st.tMs) None
              else {
                if (st == null) st = TrendSt(tMs, 0L, 0.0, 0.0, 0.0, 0.0, tMs, v)
                val t = (tMs - st.t0Ms) / 1000.0
                st = TrendSt(st.t0Ms, st.n + 1, st.st + t, st.sv + v,
                  st.stv + t * v, st.stt + t * t, tMs, v)
                val n = st.n.toDouble
                val mt = st.st / n; val mv = st.sv / n
                val varT = st.stt / n - mt * mt
                val slope =
                  if (st.n >= 2 && varT > 0) Some((st.stv / n - mt * mv) / varT)
                  else None
                val predicted = slope.map(s => mv + s * (t + horizonSec - mt))
                Some(TrendRow(key, ts, v, st.n, slope, predicted))
              }
            }
            if (st != null) {
              state.update(st)
              // anchor on the STATE's last event time, not the batch's:
              // a batch of all-late rows must not pull expiry earlier
              state.setTimeoutTimestamp(st.tMs, idleExpiry)
            }
            out.iterator
          }
      }.toDF()
  }

  /** Running whole-range-change state: first value, last (ts, value),
    * reset-aware increase, point count — O(1) per live series. */
  case class DeltaSt(firstV: Double, tMs: Long, v: Double,
      increase: Double, n: Long)

  /** Running whole-range change per live series — the streaming twin of
    * [[graft.tsdb.TsAnalytics.rangeDelta]]: each arriving point emits the
    * series' running `n_points`, gauge `delta` (value − first value) and
    * counter-reset-aware `increase`, so a dashboard watches counters
    * grow live instead of re-scanning. After any in-order prefix the
    * LAST emitted row per series equals the batch operator's row over
    * that prefix (spec-pinned parity). A series' first point emits
    * (n=1, 0, 0) like the batch single-sample contract; late rows (at or
    * before the last seen event time) are dropped, like [[rate]]. State
    * expires after `idleExpiry` beyond the watermark. */
  def runningDelta(points: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, counterReset: Boolean = true,
      lateness: String = "10 minutes",
      idleExpiry: String = "1 hour"): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val ds = points
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("t"),
        col(valueCol).cast("double").as("v"))
      .withWatermark("t", lateness)
      .as[(String, Timestamp, Double)]
    implicit val stEnc = Encoders.product[DeltaSt]
    implicit val rowEnc = Encoders.product[DeltaRow]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[DeltaSt, DeltaRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Timestamp, Double)],
            state: GroupState[DeltaSt]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.orNull
            val batch = rows.toIndexedSeq.sortBy(_._2.getTime)
            val out = batch.flatMap { case (_, t, v) =>
              val tMs = t.getTime
              if (st == null) {
                st = DeltaSt(v, tMs, v, 0.0, 1L)
                Some(DeltaRow(key, t, v, 1L, 0.0, 0.0))
              } else if (tMs <= st.tMs) None // late/dup: dropped like rate
              else {
                val d = if (counterReset && v < st.v) v else v - st.v
                st = DeltaSt(st.firstV, tMs, v, st.increase + d, st.n + 1)
                Some(DeltaRow(key, t, v, st.n, v - st.firstV, st.increase))
              }
            }
            if (st != null) {
              state.update(st)
              // state's own last event time: all-late batches must not
              // pull the expiry deadline earlier ([[trend]] note)
              state.setTimeoutTimestamp(st.tMs, idleExpiry)
            }
            out.iterator
          }
      }.toDF()
  }

  /** Running counter-transition state: last (ts ms, value), reset and
    * change counts, point count — O(1) per live series. */
  case class TransSt(tMs: Long, v: Double, resets: Long, changes: Long,
      n: Long)

  case class TransRow(series_key: String, ts: Timestamp, value: Double,
      n_points: Long, resets: Long, changes: Long)

  /** Streaming counter-transition counts — the streaming twin of
    * [[graft.tsdb.TsAnalytics.transitions]] (PromQL `resets`/`changes`):
    * each arriving point emits the series' running reset count (pairs
    * whose value decreased) and change count (pairs that differed), so a
    * dashboard watches counter restarts live. Counts are exact longs —
    * after any in-order prefix the LAST emitted row per series equals
    * the batch operator's row over that prefix BIT-identically
    * (spec-pinned). A series' first point emits (n=1, 0, 0); late rows
    * (at or before the last seen event time) are dropped, like [[rate]].
    * State expires after `idleExpiry` beyond the watermark. */
  def transitions(points: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, lateness: String = "10 minutes",
      idleExpiry: String = "1 hour"): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    // NaN/±Inf are not samples (batch gets cleanNumeric via
    // QueryEngine.numericOf) — drop them BEFORE the stateful fold so the
    // n_points/resets/changes counts stay bit-identical to the batch twin
    val ds = points
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("t"),
        graft.tsdb.AggFunctions.cleanNumeric(col(valueCol).cast("double"))
          .as("v"))
      .filter(col("v").isNotNull)
      .withWatermark("t", lateness)
      .as[(String, Timestamp, Double)]
    implicit val stEnc = Encoders.product[TransSt]
    implicit val rowEnc = Encoders.product[TransRow]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[TransSt, TransRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Timestamp, Double)],
            state: GroupState[TransSt]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.orNull
            val batch = rows.toIndexedSeq.sortBy(_._2.getTime)
            val out = batch.flatMap { case (_, t, v) =>
              val tMs = t.getTime
              if (st == null) {
                st = TransSt(tMs, v, 0L, 0L, 1L)
                Some(TransRow(key, t, v, 1L, 0L, 0L))
              } else if (tMs <= st.tMs) None // late/dup: dropped like rate
              else {
                val r = st.resets + (if (v < st.v) 1L else 0L)
                val c = st.changes + (if (v != st.v) 1L else 0L)
                st = TransSt(tMs, v, r, c, st.n + 1)
                Some(TransRow(key, t, v, st.n, r, c))
              }
            }
            if (st != null) {
              state.update(st)
              // state's own last event time ([[trend]] note)
              state.setTimeoutTimestamp(st.tMs, idleExpiry)
            }
            out.iterator
          }
      }.toDF()
  }

  /** Streaming per-second rate — the streaming twin of
    * [[graft.tsdb.TsAnalytics.rate]] (PromQL `rate` contract, counter
    * resets clamped to the new value). State per live series is ONE
    * (timestamp, value) pair — bounded by live series alone — with the
    * same event-time idle expiry as [[score]]/[[smooth]]. The first
    * point of a series (or after idle expiry) emits nothing, matching
    * the batch contract's range-internal-predecessor rule; duplicate
    * timestamps emit nothing (the batch twin's merged view can't produce
    * dt = 0). Arithmetic mirrors the batch operator in ns
    * (`delta · 1e9 / dtNs`), so for ms-aligned event times the values
    * match bit-for-bit. */
  def rate(points: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, counterReset: Boolean = true,
      lateness: String = "10 minutes",
      idleExpiry: String = "1 hour"): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val ds = points
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("t"),
        col(valueCol).cast("double").as("v"))
      .withWatermark("t", lateness)
      .as[(String, Timestamp, Double)]
    implicit val lastEnc = Encoders.product[LastPt]
    implicit val ratedEnc = Encoders.product[Rated]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[LastPt, Rated](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Timestamp, Double)],
            state: GroupState[LastPt]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var prev = state.getOption.orNull
            val batch = rows.toIndexedSeq.sortBy(_._2.getTime)
            val out = batch.flatMap { case (_, t, v) =>
              val tMs = t.getTime
              val emitted =
                if (prev == null || tMs <= prev.tMs) None
                else {
                  val delta =
                    if (counterReset && v < prev.v) v else v - prev.v
                  val dtNs = (tMs - prev.tMs) * 1000000L
                  Some(Rated(key, t, v, delta, delta * 1e9 / dtNs.toDouble))
                }
              if (prev == null || tMs >= prev.tMs) prev = LastPt(tMs, v)
              emitted
            }
            if (prev != null) {
              state.update(prev)
              // state's own last event time: all-late batches must not
              // pull the expiry deadline earlier ([[trend]] note)
              state.setTimeoutTimestamp(prev.tMs, idleExpiry)
            }
            out.iterator
          }
      }.toDF()
  }

  /** `points` must carry (`keyCol`: string, `tsCol`: TimestampType event
    * time, `valueCol`: numeric). Emits one [[Scored]] row per input
    * point in Append mode. */
  def score(points: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, lookback: Int = 20, minPoints: Int = 5,
      threshold: Double = 3.0, lateness: String = "10 minutes",
      idleExpiry: String = "1 hour"): DataFrame = {
    require(lookback >= 2 && minPoints >= 2 && minPoints <= lookback,
      s"need 2 <= minPoints <= lookback, got lookback=$lookback minPoints=$minPoints")
    val spark = points.sparkSession
    import spark.implicits._
    val ds = points
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("t"),
        col(valueCol).cast("double").as("v"))
      .withWatermark("t", lateness)
      .as[(String, Timestamp, Double)]

    implicit val ringEnc = Encoders.product[Ring]
    implicit val scoredEnc = Encoders.product[Scored]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Ring, Scored](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Timestamp, Double)],
            state: GroupState[Ring]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var ring = state.getOption.getOrElse(Ring(Vector.empty))
            val batch = rows.toIndexedSeq.sortBy(_._2.getTime)
            val out = batch.map { case (_, t, v) =>
              val win = ring.vals
              val n = win.size
              val scored =
                if (n >= minPoints) {
                  val mean = win.sum / n
                  val sd = math.sqrt(
                    win.map(x => (x - mean) * (x - mean)).sum / (n - 1))
                  if (sd > 1e-12) Some((mean, sd, (v - mean) / sd)) else None
                } else None
              ring = Ring((ring.vals :+ v).takeRight(lookback))
              Scored(key, t, v, scored.map(_._1), scored.map(_._2),
                scored.map(_._3),
                scored.exists(s => math.abs(s._3) > threshold))
            }
            state.update(ring)
            // expire state once the series has been silent past the
            // idle horizon (event time; clamped to >= watermark by Spark)
            state.setTimeoutTimestamp(batch.last._2.getTime, idleExpiry)
            out.iterator
          }
      }.toDF()
  }
}
