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

/** Streaming NEAR-dedup for a continuously-arriving document feed — the
  * streaming twin of [[graft.pipeline.Dedup.incrementalDedup]].
  *
  * Near-dup state cannot be watermark-bounded the way exact-dedup state
  * is ([[StreamingDedup]]): "have I seen a similar document" has to
  * look over the whole admitted corpus, so the state IS the materialized
  * dedup index ([[graft.pipeline.Dedup.writeDedupIndex]] — fps, band
  * keys, candidate shingles; it grows with DISTINCT content, never with
  * the raw feed). Each micro-batch:
  *
  *  1. judge the batch against the index
  *     ([[graft.pipeline.Dedup.incrementalDedupIndexed]] — cross-side
  *     band join only, never index ⋈ index);
  *  2. resolve WITHIN-batch duplicates (exact fingerprint groups + LSH
  *     pairs inside the batch — two docs first seen in the same
  *     micro-batch must not both be admitted);
  *  3. append the admitted `new` rows to the index under a
  *     per-batch partition (OVERWRITE of that partition, so micro-batch
  *     replays after failure are idempotent);
  *  4. hand the verdict frame to the caller's sink.
  *
  * Verdict policy (first match wins, deterministic): exact-dup against
  * the index, exact-dup within the batch (min-id representative),
  * near-dup against the index, near-dup within the batch (min doc_a of
  * a verified pair), else `new`. Chains (b near-dups a, a exact-dups an
  * index doc) resolve one hop, like the batch operator; full transitive
  * resolution is the downstream connected-components pass. */
object StreamingNearDedup {

  import graft.pipeline.Dedup

  /** One micro-batch's verdicts: (doc_id, verdict, dup_of). Pure batch
    * plan — also the unit the spec pins against the batch operator.
    * `excludeBatch` masks this batch's OWN index partition so a
    * replayed micro-batch (whose append may already be on disk) judges
    * against the same index state the first attempt saw. */
  def verdictsForBatch(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, batch: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, threshold: Double,
      excludeBatch: Option[String] = None): DataFrame = {
    val vsIndex = Dedup.incrementalDedupIndexed(spark, indexPath, batch,
      idCol, textCol, n, k, bands, threshold, excludeBatch)
    val eg = Dedup.exactGroups(batch, idCol, textCol)
    val wbExact = batch
      .select(col(idCol).as("doc_id"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .join(eg, "fp").filter(col("keep_id") < col("doc_id"))
      .select(col("doc_id"), col("keep_id").as("wb_exact_of"))
    val wbNear = Dedup.minhashLshPairs(batch, idCol, textCol, n, k, bands, threshold)
      .groupBy(col("doc_b").as("doc_id")).agg(min(col("doc_a")).as("wb_near_of"))
    vsIndex
      .join(wbExact, Seq("doc_id"), "left")
      .join(wbNear, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("verdict") === "exact_dup", "exact_dup")
          .when(col("wb_exact_of").isNotNull, "exact_dup")
          .when(col("verdict") === "near_dup", "near_dup")
          .when(col("wb_near_of").isNotNull, "near_dup")
          .otherwise("new").as("verdict"),
        when(col("verdict") === "exact_dup", col("dup_of"))
          .when(col("wb_exact_of").isNotNull, col("wb_exact_of"))
          .when(col("verdict") === "near_dup", col("dup_of"))
          .otherwise(col("wb_near_of")).as("dup_of"))
  }

  /** Start the stream: verdicts per micro-batch to `sink`, novel rows
    * appended to the index. The index must exist
    * ([[graft.pipeline.Dedup.writeDedupIndex]], possibly of an empty
    * frame, runs once before the stream starts). */
  def run(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, checkpoint: String,
      n: Int = 3, k: Int = 8, bands: Int = 4, threshold: Double = 0.8)
      (sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val pinned = batch.persist()
        val v = verdictsForBatch(spark, indexPath, pinned, idCol, textCol,
          n, k, bands, threshold, excludeBatch = Some(s"b$batchId")).persist()
        try {
          val novel = pinned.join(
            v.filter(col("verdict") === "new").select(col("doc_id").as(idCol)),
            Seq(idCol), "leftsemi")
          Dedup.appendDedupIndex(novel, idCol, textCol, n, k, bands,
            indexPath, s"b$batchId")
          sink(v, batchId)
        } finally { v.unpersist(); pinned.unpersist() }
      }
      .start()
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
