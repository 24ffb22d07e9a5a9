package graft.streaming

import graft.model.DataPoint
import graft.tsdb.TsdbEngine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured-Streaming ingest: the high-volume counterpart of the
  * reference's gRPC Put/PutBatch + NBQL PUSH fast path (S1-S3,
  * `engine2/adapter.go:436-751`, `server/tcp_connection_handler.go:122`).
  *
  * Wire format: one JSON object per line/record —
  * `{"metric":…, "tags":{…}, "timestamp":ns, "fields":{name:{"d":…}|{"l":…}|{"s":…}|{"b":…}}}`
  * — parsed with a fixed schema (no inference on the hot path), validated
  * (reference `core/validator.go` name rules), stamped with a write
  * sequence, and appended to the engine's storage by `foreachBatch`.
  *
  * Delivery is EXACTLY-ONCE: each micro-batch commits to the engine's
  * transaction log with an (app, batchId) watermark, so a batch the
  * checkpoint replays after a crash is recognized and skipped before any
  * file becomes visible — idempotent-writer dedup, the same mechanism a
  * Delta `txnAppId`/`txnVersion` sink uses. Combined with the log's
  * no-torn-reads guarantee this matches the reference's WAL recovery
  * semantics (S4, `wal/wal.go:53-60`, `engine2/engine_recovery_test.go`);
  * belt-and-braces, a replayed row would also lose the
  * latest-version-wins merge, so even a watermark wipe cannot surface
  * duplicates to readers.
  */
object Ingest {

  val wireSchema: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("timestamp", LongType),
    StructField("fields", MapType(StringType, graft.model.FieldValue.sparkType))))

  /** A declarative ingest-guard rule (extends the reference's
    * `core/validator.go` name checks with content checks): scoped by a
    * metric pattern (trailing-`*` prefix, like subscriptions), it rejects
    * a point whose numeric field value leaves [minValue, maxValue] or
    * whose tag value is outside an allowlist. Compiled to pure Column
    * predicates — the guard rides the ingest stream's codegen, no UDF. */
  final case class IngestRule(
      metric: String = "*",
      field: String = "*",
      minValue: Option[Double] = None,
      maxValue: Option[Double] = None,
      allowedTags: Map[String, Seq[String]] = Map.empty) {

    private[streaming] def violated: Column = {
      val scope = PubSub.patternMatch(col("metric"), metric)
      val vals =
        if (field == "*") map_values(col("fields"))
        else array(col("fields").getItem(field))
      def num(v: Column): Column =
        coalesce(v.getField("d"), v.getField("l").cast("double"))
      val range = (minValue, maxValue) match {
        case (None, None) => lit(false)
        case (lo, hi) =>
          exists(vals, v =>
            lo.map(m => num(v) < m).getOrElse(lit(false)) ||
              hi.map(m => num(v) > m).getOrElse(lit(false)))
      }
      val tagViolation = allowedTags.map { case (k, allowed) =>
        col("tags").getItem(k).isNotNull &&
          !col("tags").getItem(k).isin(allowed: _*)
      }.foldLeft(lit(false))(_ || _)
      scope && (range || tagViolation)
    }

    /** Driver-side evaluation of the same rule, for the hook-listener
      * form ([[graft.hooks.Listeners.IngestGuardListener]]) on the
      * driver-mediated put path. Semantics identical to [[violated]]. */
    def violatedBy(p: DataPoint): Boolean = {
      def pat(s: String, q: String): Boolean =
        q == "*" || (if (q.endsWith("*")) s.startsWith(q.dropRight(1)) else s == q)
      if (!pat(p.metric, metric)) false
      else {
        val vals =
          if (field == "*") p.fields.values.toSeq else p.fields.get(field).toSeq
        val range = vals.exists(v => v.numeric.exists(n =>
          minValue.exists(n < _) || maxValue.exists(n > _)))
        val tagViolation = allowedTags.exists { case (k, allowed) =>
          p.tags.get(k).exists(tv => !allowed.contains(tv)) }
        range || tagViolation
      }
    }
  }

  /** Parse a stream/frame of JSON strings (column `value`) into canonical
    * points; malformed or invalid-name rows — and rows violating any
    * [[IngestRule]] — are routed to a `_rejected` flag instead of failing
    * the stream (at 100 TB a poison record must never kill ingest). */
  def parse(raw: DataFrame, rules: Seq[IngestRule] = Nil): DataFrame = {
    val parsed = raw.select(from_json(col("value").cast("string"), wireSchema).as("p"))
      .select(col("p.metric"), col("p.tags"), col("p.timestamp"), col("p.fields"))
    parsed.withColumn("_rejected", rules.map(_.violated).foldLeft(
      col("metric").isNull || length(col("metric")) === 0 ||
        col("timestamp").isNull || col("fields").isNull ||
        col("metric").contains(" ") || col("metric").contains("\u0000"))(_ || _))
  }

  /** Start streaming ingest into an engine. Each micro-batch reserves a
    * block of the engine's sequence space (rows get unique, monotonically
    * increasing seqs — later batches always win the version merge) and
    * commits with an (appId, batchId) watermark for exactly-once; the
    * commit lands as a LEVEL-0 file set (shuffle-free, one file per
    * source partition — [[graft.tsdb.TsdbEngine.compactL0]] migrates). */
  def start(engine: TsdbEngine, source: DataFrame, checkpointDir: String,
      appId: String = null, rules: Seq[IngestRule] = Nil): StreamingQuery = {
    val app = Option(appId).getOrElse(checkpointDir)
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pts = parse(batch, rules).filter(!col("_rejected"))
          .drop("_rejected")
          .withColumn("tags", coalesce(col("tags"), map()))
        val base = engine.reserveSeqBlock()
        engine.putDF(pts.withColumn("seq", lit(base) + monotonically_increasing_id()),
          txn = Some((app, batchId)))
      }
      .start()
  }
}
