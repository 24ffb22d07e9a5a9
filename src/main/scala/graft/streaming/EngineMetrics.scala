package graft.streaming

import graft.model.{DataPoint, FieldValue}
import graft.tsdb.TsdbEngine
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Self-monitoring (ST5): the reference republishes its internals as
  * `__`-prefixed series (`engine2/metrics.go`, `cmd/server/config.yaml:
  * 76-79`); here a `StreamingQueryListener` turns every micro-batch
  * progress event into `__graft.streaming.*` points in the engine itself,
  * so the monitoring data is queryable with the same NBQL/DataFrame
  * surface as user data. */
final class EngineMetricsListener(engine: TsdbEngine)
    extends StreamingQueryListener {

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val ts = java.time.Instant.parse(p.timestamp).toEpochMilli * 1000000L
    val tags = Map("query" -> Option(p.name).getOrElse(p.id.toString))
    val fields = Map(
      "input_rows" -> FieldValue.ofLong(p.numInputRows),
      "rows_per_sec" -> FieldValue.ofDouble(
        if (p.inputRowsPerSecond.isNaN) 0.0 else p.inputRowsPerSecond),
      "batch_id" -> FieldValue.ofLong(p.batchId))
    // Swallow failures: monitoring must never take down ingest.
    try engine.putBatch(Seq(
      DataPoint("__graft.streaming.progress", tags, ts, fields)))
    catch { case _: Throwable => () }
  }
}
