package graft.hooks

import graft.model.DataPoint
import graft.streaming.Ingest.IngestRule

/** The shipped listeners — the engine analogs of the reference's
  * `hooks/listeners/` package, re-homed onto the generic [[HookManager]]
  * so a deployment extends the engine by REGISTERING, not by editing
  * graft code. The streaming-ingest path keeps its Column-compiled
  * equivalents ([[graft.streaming.Ingest.parse]],
  * [[graft.streaming.Hooks]]) — those are the 100 TB scale path; these
  * listeners cover the driver-mediated put/delete/admin path where
  * per-event dispatch is cheap. */
object Listeners {

  final case class Alert(kind: String, message: String)

  /** Base for listeners that accumulate alerts for later inspection
    * (standing in for the reference's slog warnings). */
  trait Alerting {
    private val q = new java.util.concurrent.ConcurrentLinkedQueue[Alert]
    protected def alert(kind: String, msg: String): Unit = q.add(Alert(kind, msg))
    def alerts: Seq[Alert] = { import scala.collection.JavaConverters._; q.iterator.asScala.toSeq }
  }

  /** Threshold outlier detector
    * (`hooks/listeners/outlier_detector.go:19-105`): observes Post-put
    * events and alerts on numeric field values outside [lo, hi]. Pure
    * observer — never fails the write. */
  final class OutlierDetectorListener(field: String, lo: Double, hi: Double,
      override val isAsync: Boolean = false) extends HookListener with Alerting {
    private def check(p: DataPoint): Unit =
      p.fields.get(field).flatMap(_.numeric).foreach { v =>
        if (v < lo || v > hi)
          alert("outlier", s"${p.metric}: $field=$v outside [$lo,$hi]")
      }
    def onEvent(event: HookEvent): Either[String, Unit] = {
      event.payload match {
        case p: Payloads.PostPutDataPoint => check(p.point)
        case p: Payloads.PostPutBatch => p.points.foreach(check)
        case _ => ()
      }
      Right(())
    }
  }

  /** New-series cardinality alerter
    * (`hooks/listeners/cardinality_alerter.go:14-46`): warns once per
    * newly created series key on `OnSeriesCreate`. Async in the
    * reference; async by default here too. */
  final class CardinalityAlerterListener(override val isAsync: Boolean = true)
      extends HookListener with Alerting {
    def onEvent(event: HookEvent): Either[String, Unit] = {
      event.payload match {
        case p: Payloads.OnSeriesCreate =>
          alert("cardinality", s"new series created: ${p.seriesKey}")
        case _ => ()
      }
      Right(())
    }
  }

  final case class CompactionStats(bytesRead: Long, bytesWritten: Long,
      events: Long) {
    /** Write-amplification factor; 0 when nothing read (`waf.go:32-35`). */
    def waf: Double =
      if (bytesRead == 0) 0.0 else bytesWritten.toDouble / bytesRead
  }

  /** Write-amplification accounting
    * (`hooks/listeners/waf.go:23-94`): PostCompaction sums old-table
    * bytes as read, new-table bytes as written; `stats.waf` =
    * written/read. Registered by default on every [[graft.tsdb.TsdbEngine]]. */
  final class WriteAmplificationListener extends HookListener {
    private val read = new java.util.concurrent.atomic.AtomicLong
    private val written = new java.util.concurrent.atomic.AtomicLong
    private val events = new java.util.concurrent.atomic.AtomicLong
    def onEvent(event: HookEvent): Either[String, Unit] = {
      event.payload match {
        case p: Payloads.PostCompaction =>
          read.addAndGet(p.bytesRead)
          written.addAndGet(p.bytesWritten)
          events.incrementAndGet()
        case _ => ()
      }
      Right(())
    }
    def stats: CompactionStats =
      CompactionStats(read.get(), written.get(), events.get())
  }

  /** Declarative ingest guard on the driver-mediated put path: the
    * listener form of [[graft.streaming.Ingest.IngestRule]] (same rules,
    * same semantics as the streaming `_rejected` routing). A violating
    * single put is VETOED (`Left`, pre-hook cancellation); in a batch,
    * violating points are DROPPED and the rest land — mirroring the
    * stream, where a poison record must never kill the batch. Runs at
    * priority 10 so guards precede user transformers. */
  final class IngestGuardListener(rules: Seq[IngestRule])
      extends HookListener with Alerting {
    override val priority: Int = 10
    def onEvent(event: HookEvent): Either[String, Unit] = event.payload match {
      case p: Payloads.PrePutDataPoint =>
        rules.find(_.violatedBy(p.point)) match {
          case Some(r) => Left(s"ingest rule violated (metric=${r.metric}, field=${r.field})")
          case None => Right(())
        }
      case p: Payloads.PrePutBatch =>
        val (bad, good) = p.points.partition(pt => rules.exists(_.violatedBy(pt)))
        bad.foreach(pt => alert("rejected", s"${pt.metric}@${pt.timestamp}"))
        p.points = good
        Right(())
      case _ => Right(())
    }
  }
}
