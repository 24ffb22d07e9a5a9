package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-to-point time-series analytics over the merged view — the
  * operators every TSDB in the reference's family exposes on top of raw
  * scans (PromQL `rate`/`delta`, monitoring anomaly bands). The reference
  * itself stops at whole-window aggregation (`iterator/agg_helpers.go`);
  * these are extensions, built the same way as the engine's query
  * pipeline: metric/tag/time filters that reach the parquet scan, then
  * per-series ordered window functions.
  *
  * Plan shape at 100 TB: one hash exchange on series_key (the window
  * partition), sort within partitions by timestamp, narrow lag/rolling
  * computations — no joins, no driver collection. Like any ordered
  * per-series scan (sessionize included) a single pathologically hot
  * series serializes into one task; the fix at scale is range-splitting
  * that series by time and recomputing the boundary rows, which these
  * operators don't need at battery scales.
  */
object TsAnalytics {

  /** Series-resolved, time-ranged, latest-version-merged slice with a
    * numeric `__v` column for `field` — the shared front half. */
  private def slice(points: DataFrame, p: QueryParams, field: String,
      tombstones: Seq[Tombstone]): DataFrame = {
    var df = points.filter(col("metric") === p.metric)
    p.tags.foreach { case (k, v) => df = df.filter(col("tags").getItem(k) === v) }
    val (startNs, endNs) = QueryEngine.resolveRange(df, p)
    df = df.filter(col("timestamp").between(startNs, endNs))
    QueryEngine.mergedView(df, tombstones)
      .withColumn("__v", QueryEngine.numericOf(field))
  }

  /** Per-series instantaneous rate of change in units/second between
    * consecutive points (PromQL `rate`-style). With `counterReset = true`
    * a decrease is treated as a counter reset: the delta is the new value
    * itself (the counter restarted from 0), never negative. The first
    * point of each series has no predecessor and emits no row; a rate is
    * computed only WITHIN the scanned range (the point before `startNs`
    * is deliberately not consulted — same contract as PromQL's window).
    *
    * Output: metric, tags, series_key, timestamp, value, delta,
    * rate_per_sec, ordered by (series_key, timestamp). */
  def rate(points: DataFrame, p: QueryParams, field: String = "value",
      counterReset: Boolean = true,
      tombstones: Seq[Tombstone] = Nil): DataFrame = {
    val df = slice(points, p, field, tombstones)
    val w = Window.partitionBy(col("series_key")).orderBy(col("timestamp"))
    val rawDelta = col("__v") - col("__pv")
    val delta =
      if (counterReset) when(col("__v") < col("__pv"), col("__v")).otherwise(rawDelta)
      else rawDelta
    val dt = col("timestamp") - col("__pt")
    df.withColumn("__pv", lag(col("__v"), 1).over(w))
      .withColumn("__pt", lag(col("timestamp"), 1).over(w))
      .filter(col("__pt").isNotNull && col("__pv").isNotNull)
      .withColumn("delta", delta)
      // merged view guarantees distinct timestamps per series, so dt > 0;
      // the guard keeps ANSI mode unconditionally safe
      .withColumn("rate_per_sec",
        col("delta") * lit(1e9) / when(dt =!= 0L, dt.cast("double")))
      .select(col("metric"), col("tags"), col("series_key"), col("timestamp"),
        col("__v").as("value"), col("delta"), col("rate_per_sec"))
      .orderBy(col("series_key"), col("timestamp"))
  }

  /** Per-series rolling z-score: each point scored against the mean and
    * sample stddev of its own TRAILING `lookback` points (the point
    * itself excluded — the score tests the point against its past, so a
    * level shift scores high on arrival instead of polluting its own
    * baseline). `z` is null until `minPoints` predecessors exist or when
    * the trailing window has ~zero variance; `is_anomaly` marks |z| above
    * `threshold`.
    *
    * Output: metric, tags, series_key, timestamp, value, mean, stddev, z,
    * is_anomaly, ordered by (series_key, timestamp). */
  def rollingZScore(points: DataFrame, p: QueryParams, field: String = "value",
      lookback: Int = 20, minPoints: Int = 5, threshold: Double = 3.0,
      tombstones: Seq[Tombstone] = Nil): DataFrame = {
    require(lookback >= 2 && minPoints >= 2 && minPoints <= lookback,
      s"need 2 <= minPoints <= lookback, got lookback=$lookback minPoints=$minPoints")
    val df = slice(points, p, field, tombstones)
    val w = Window.partitionBy(col("series_key")).orderBy(col("timestamp"))
      .rowsBetween(-lookback, -1)
    val mean = avg(col("__v")).over(w)
    val sd = stddev_samp(col("__v")).over(w)
    val n = count(col("__v")).over(w)
    // stddev within 1e-12 of zero → undefined score (a constant baseline
    // makes any change infinitely surprising; report null, not ±Inf)
    val z = when(n >= minPoints && sd > 1e-12,
      (col("__v") - mean) / when(sd =!= 0.0, sd))
    df.withColumn("mean", mean).withColumn("stddev", sd).withColumn("z", z)
      .withColumn("is_anomaly", coalesce(abs(col("z")) > threshold, lit(false)))
      .select(col("metric"), col("tags"), col("series_key"), col("timestamp"),
        col("__v").as("value"), col("mean"), col("stddev"), col("z"),
        col("is_anomaly"))
      .orderBy(col("series_key"), col("timestamp"))
  }
}
