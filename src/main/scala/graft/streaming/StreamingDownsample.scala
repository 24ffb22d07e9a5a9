package graft.streaming

import graft.tsdb.{AggFunctions, AggSpec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window downsample — the streaming twin of the
  * engine's A2 operator. The aggregation kernel is LITERALLY the
  * engine's ([[graft.tsdb.AggFunctions.build]] over generic columns):
  * count-star vs non-null count, sum 0 / avg-min-max NaN over empty
  * value sets, first/last in event-time stream order, sample stddev NaN
  * below two samples, frac with the reference's zero/±Inf cases — so a
  * window's row is identical to what the batch path would emit for the
  * same points (spec-pinned, including the NaN conventions).
  *
  * Streaming semantics: epoch-aligned tumbling `window()` over the
  * event-time column with a watermark. Each (series, window) row emits
  * ONCE, when the watermark passes the window end (Append mode — the
  * exactly-once downstream contract); rows later than the watermark are
  * dropped by Spark's state store, the streaming analog of the batch
  * path's "the merged view is what it is when you query it".
  *
  * Percentile specs are rejected: the exact-sort percentile the batch
  * kernel uses cannot run incrementally — register a digest rollup and
  * query the engine for percentile downsamples instead
  * ([[graft.tsdb.Rollup]] WITH DIGESTS).
  *
  * Output: series_key, window_start, window_end (ns epoch longs, same
  * columns as the engine's downsample), then one column per spec
  * (`outputName`). */
object StreamingDownsample {

  def downsample(points: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, intervalNs: Long, aggs: Seq[AggSpec],
      lateness: String = "10 minutes"): DataFrame = {
    require(intervalNs > 0 && intervalNs % 1000L == 0L,
      s"interval must be a positive whole number of microseconds (TimestampType precision), got $intervalNs ns")
    require(aggs.nonEmpty, "downsample needs at least one aggregation")
    aggs.foreach { s =>
      require(s.percentile.isEmpty,
        "percentiles don't run incrementally — use a WITH DIGESTS rollup on the engine")
      require(AggFunctions.named.contains(s.func),
        s"unknown aggregation function: ${s.func}")
    }
    val df = points
      .select(col(keyCol).cast("string").as("series_key"),
        col(tsCol).as("__t"), col(valueCol).cast("double").as("__v"))
      .withWatermark("__t", lateness)
    // the engine kernel's inputs: numeric value (NaN/Inf are not samples,
    // same cleanNumeric contract as storage), non-null marker, stream ord
    // (ts, series_key, −seq) — a stream has no versions, so seq = 0
    val v = AggFunctions.cleanNumeric(col("__v"))
    val tsNs = (unix_micros(col("__t")) * 1000L).as("timestamp")
    val ord = struct(tsNs, col("series_key"), lit(0L).as("negseq"))
    val aggCols: Seq[Column] = aggs.map { s =>
      val numeric = if (s.field == "*") lit(null).cast("double") else v
      val nonNull = if (s.field == "*") lit(1) else col("__v")
      // build takes the null-GATED ord (r18)
      AggFunctions.build(s, numeric, nonNull, when(numeric.isNotNull, ord))
    }
    df.groupBy(col("series_key"),
        window(col("__t"), s"${intervalNs / 1000L} microseconds"))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("series_key") +:
        (unix_micros(col("window.start")) * 1000L).as("window_start") +:
        (unix_micros(col("window.end")) * 1000L).as("window_end") +:
        aggs.map(s => col(s.outputName)): _*)
  }
}
