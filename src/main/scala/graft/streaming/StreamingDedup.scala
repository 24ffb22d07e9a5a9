package graft.streaming

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup for a continuously-arriving document feed: each
  * doc is fingerprinted (md5 of normalized text — same key as the batch
  * [[graft.pipeline.Dedup.exactGroups]]), and only the FIRST copy of a
  * fingerprint within the watermark horizon is emitted downstream.
  *
  * State is the fingerprint → seen map held by
  * `dropDuplicatesWithinWatermark`, which (unlike plain
  * `dropDuplicates`) EXPIRES entries once the event-time watermark
  * passes them — the property that keeps a 100 TB/day feed's state
  * bounded by (arrival rate × lateness) instead of growing with corpus
  * size. Duplicates separated by more than the watermark horizon can
  * re-emit; a pipeline needing forever-dedup runs the batch
  * connected-component pass downstream (the standard lambda split).
  * The dedup state partitions by fingerprint hash, so the stateful
  * stage scales horizontally with no hot keys (md5 is uniform). */
object StreamingDedup {

  /** `docs` must carry an event-time timestamp column `tsCol`; emits the
    * input rows plus the `fp` fingerprint, first copy per fp only. */
  def exactDedup(docs: DataFrame, tsCol: String, textCol: String,
      lateness: String): DataFrame =
    docs.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")
}

/** Streaming gap sessionization — the Structured Streaming twin of
  * [[graft.operators.Sessionize]]: Spark's native `session_window`
  * merges events of a key into sessions that close when no event
  * arrives within `gap`, finalizing each session once the watermark
  * passes its end (no trigger needed to flush idle sessions). State per
  * key is ONE open session (start, end, partials) — bounded by live-key
  * cardinality × lateness, not by history; session state partitions by
  * key hash and scales horizontally like any streaming aggregation.
  * Batch and streaming emit the same rollup columns, so a lambda
  * pipeline can reconcile the two paths row-for-row. */
object StreamingSessionize {

  /** `events` must carry an event-time timestamp `tsCol` (TimestampType);
    * emits one finalized row per (key, session):
    * (key, session_start, session_end, n_events). */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, lateness: String): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
