package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Real-time subscription semantics (S8, `engine2/pubsub.go`):
  * subscribers receive per-write `DataPointUpdate`s filtered by metric and
  * tag values, where both support a trailing-`*` PREFIX wildcard
  * (`engine2/pubsub.go:34-60`). On Spark the update stream is just the
  * ingest stream (or a table changefeed) and a subscription is a filter —
  * backpressure replaces the reference's drop-on-overflow channel (ST1,
  * a semantics upgrade SURVEY §2.7 calls out). */
object PubSub {

  final case class SubscriptionFilter(metric: String,
      tags: Map[String, String] = Map.empty)

  /** `pat` matches exactly, or by prefix when it ends with `*`; bare `*`
    * matches everything. */
  def patternMatch(c: Column, pat: String): Column =
    if (pat == "*") lit(true)
    else if (pat.endsWith("*")) c.startsWith(pat.dropRight(1))
    else c === pat

  def matches(f: SubscriptionFilter): Column =
    f.tags.foldLeft(patternMatch(col("metric"), f.metric)) {
      case (acc, (k, pat)) => acc && patternMatch(col("tags").getItem(k), pat)
    }

  /** Apply a subscription to an update stream (works identically on batch
    * and streaming frames). */
  def subscribe(updates: DataFrame, f: SubscriptionFilter): DataFrame =
    updates.filter(matches(f))
}

/** Event-time streaming aggregation (ST3 — ABSENT in the reference,
  * whose downsampling is batch-only over stored data; Structured
  * Streaming adds it): tumbling windows on the event-time column with a
  * watermark bounding state and dropping data later than `lateness`. */
object StreamingAgg {
  import org.apache.spark.sql.DataFrame

  /** Per-(window, metric) streaming rollup. `tsCol` must be TimestampType;
    * ns-epoch longs convert via `timestamp_micros(ns / 1000)`. */
  def windowed(points: DataFrame, tsCol: String, lateness: String,
      windowDur: String): DataFrame =
    points
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDur), col("metric"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"),
        avg(col("value")).as("avg_value"))
}

/** Hook-system analogs (ST4, `hooks/hooks.go` + shipped listeners). */
object Hooks {

  /** Threshold outlier detector (`hooks/listeners/outlier_detector.go:19-105`):
    * flags points whose numeric field leaves [lo, hi]. Stateless — a
    * pure filter usable on batch or stream. */
  def outliers(points: DataFrame, field: String, lo: Double, hi: Double): DataFrame = {
    val v = coalesce(col("fields").getItem(field).getField("d"),
      col("fields").getItem(field).getField("l").cast("double"))
    points.withColumn("_value", v)
      .filter(col("_value").isNotNull && (col("_value") < lo || col("_value") > hi))
      .withColumn("alert",
        concat(lit(s"outlier:$field outside [$lo,$hi]: "), col("_value")))
      .drop("_value")
  }

  final case class SeriesEvent(series_key: String, timestamp: Long)
  final case class NewSeriesAlert(series_key: String, first_seen: Long)

  /** New-series cardinality alerter
    * (`hooks/listeners/cardinality_alerter.go:14-46`): emits one alert the
    * first time a series key is observed. Streaming-stateful via
    * `flatMapGroupsWithState` — state is one boolean per series, sharded
    * by the group key, so cardinality tracking scales horizontally
    * instead of living in one process's map like the reference. */
  def newSeriesAlerts(events: Dataset[SeriesEvent]): Dataset[NewSeriesAlert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.series_key)
      .flatMapGroupsWithState[Boolean, NewSeriesAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[SeriesEvent], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.map(_.timestamp).min
            Iterator(NewSeriesAlert(key, first))
          }
      }
  }
}
