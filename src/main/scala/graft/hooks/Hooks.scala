package graft.hooks

import graft.model.{DataPoint, FieldValue}

/** User-pluggable engine event bus — the analog of the reference's hook
  * system (`hooks/hooks.go:23-57`, semantics pinned by
  * `hooks/hooks_test.go`):
  *
  *  - listeners register per event type with a PRIORITY (lower runs
  *    first; registration keeps the list sorted);
  *  - `Pre*` events run SYNCHRONOUSLY in priority order; a listener
  *    returning an error CANCELS the operation and skips the remaining
  *    listeners (`hooks.go:619-627`). An async flag on a Pre listener is
  *    ignored — Pre hooks must be able to veto (`hooks.go:612-616`);
  *  - `Pre*` payloads are MUTABLE (`var` fields): listeners may rewrite
  *    the data before the engine acts on it (`hooks.go:106-110` uses
  *    pointer fields for the same purpose);
  *  - `Post*`/`On*` events: synchronous listeners run inline and their
  *    errors are recorded but never fail the operation; listeners with
  *    `isAsync = true` run on a background pool, tracked so [[HookManager.stop]]
  *    can await them on shutdown (`hooks.go:631-645`).
  *
  * Event names mirror the reference's `EventType` constants where the
  * engine has the corresponding operation; memtable-flush events are
  * subsumed by compaction events because the Spark engine's `compact()`
  * IS its flush (SURVEY §1.4 / S5).
  */
object EventType {
  // data lifecycle (`hooks.go:23-36`)
  val PrePutDataPoint = "PrePutDataPoint"
  val PostPutDataPoint = "PostPutDataPoint"
  val PrePutBatch = "PrePutBatch"
  val PostPutBatch = "PostPutBatch"
  val PreDeletePoint = "PreDeletePoint"
  val PostDeletePoint = "PostDeletePoint"
  val PreDeleteSeries = "PreDeleteSeries"
  val PostDeleteSeries = "PostDeleteSeries"
  val PreDeleteRange = "PreDeleteRange"
  val PostDeleteRange = "PostDeleteRange"
  // engine/admin lifecycle (`hooks.go:38-48`)
  val PreCompaction = "PreCompaction"
  val PostCompaction = "PostCompaction"
  val PreCreateSnapshot = "PreCreateSnapshot"
  val PostCreateSnapshot = "PostCreateSnapshot"
  // commit-log manifest (the WAL/manifest analogs, `hooks.go:50-55`)
  val PostManifestWrite = "PostManifestWrite"
  // query lifecycle (`hooks.go:70-73`)
  val PreQuery = "PreQuery"
  val PostQuery = "PostQuery"
  // metadata (`hooks.go:62-64`)
  val OnSeriesCreate = "OnSeriesCreate"

  def isPre(t: String): Boolean = t.startsWith("Pre")
}

/** An event carried to listeners. Payloads for `Pre*` events expose `var`
  * fields for in-flight modification. */
final case class HookEvent(eventType: String, payload: AnyRef)

/** Thrown by DataFrame-returning APIs (where an `Either` channel does not
  * exist) when a Pre hook cancels the operation. */
final class HookVetoException(msg: String) extends RuntimeException(msg)

object Payloads {
  /** Pre-put: listeners may rewrite or veto the single point (`hooks.go:106`). */
  final class PrePutDataPoint(var point: DataPoint)
  final case class PostPutDataPoint(point: DataPoint, error: Option[String])
  /** Pre-batch: listeners may add/remove/rewrite points (`hooks.go:136-141`). */
  final class PrePutBatch(var points: Seq[DataPoint])
  final case class PostPutBatch(points: Seq[DataPoint], error: Option[String])

  final class PreDeletePoint(var metric: String, var tags: Map[String, String],
      var timestampNs: Long)
  final case class PostDeletePoint(metric: String, tags: Map[String, String],
      timestampNs: Long)
  final class PreDeleteSeries(var metric: String, var tags: Map[String, String])
  final case class PostDeleteSeries(metric: String, tags: Map[String, String],
      seriesKey: String)
  final class PreDeleteRange(var metric: String, var tags: Map[String, String],
      var startNs: Long, var endNs: Long)
  final case class PostDeleteRange(metric: String, tags: Map[String, String],
      seriesKey: String, startNs: Long, endNs: Long)

  final case class PreCompaction()
  /** Old/new file accounting of one compaction — the data the reference
    * hands its PostCompaction listeners as `CompactedTableInfo` lists
    * (`hooks.go:280-296`). */
  final case class PostCompaction(oldFiles: Seq[String], newFiles: Seq[String],
      bytesRead: Long, bytesWritten: Long)

  final class PreCreateSnapshot(var snapshotDir: String)
  final case class PostCreateSnapshot(snapshotDir: String)

  final case class PostManifestWrite(version: Long)

  final class PreQuery(var params: graft.tsdb.QueryParams)
  final case class PostQuery(params: graft.tsdb.QueryParams, durationNs: Long)

  final case class OnSeriesCreate(seriesKey: String)
}

/** A registered listener (`hooks.go:501-515`). `onEvent` returning
  * `Left(reason)` from a Pre hook cancels the operation; from a Post hook
  * it is recorded in [[HookManager.errorCount]] and execution continues. */
trait HookListener {
  def onEvent(event: HookEvent): Either[String, Unit]
  /** Lower runs first (`hooks.go:509-510`). */
  def priority: Int = 100
  /** Post-event listeners with `true` run on a background thread
    * (`hooks.go:513-514`); ignored (forced sync) for Pre events. */
  def isAsync: Boolean = false
}

object HookListener {
  /** Convenience: a sync observer from a function. */
  def apply(f: HookEvent => Either[String, Unit], prio: Int = 100,
      async: Boolean = false): HookListener = new HookListener {
    def onEvent(event: HookEvent): Either[String, Unit] = f(event)
    override def priority: Int = prio
    override def isAsync: Boolean = async
  }
}

/** Priority-ordered listener registry + trigger dispatch
  * (`hooks.go:547-655`). Thread-safe; one instance per engine. */
final class HookManager {
  private val listeners =
    new java.util.concurrent.ConcurrentHashMap[String, List[HookListener]]()
  private val asyncPool = java.util.concurrent.Executors.newCachedThreadPool(
    r => { val t = new Thread(r, "graft-hooks-async"); t.setDaemon(true); t })
  private val inflight = new java.util.concurrent.atomic.AtomicLong
  private val postErrors = new java.util.concurrent.atomic.AtomicLong
  private val lock = new Object

  /** Count of errors returned (or thrown) by Post listeners — the analog
    * of the reference's logged-and-continue error handling. */
  def errorCount: Long = postErrors.get()

  /** True when at least one listener is registered for `eventType` —
    * lets the engine skip payload construction for unobserved events. */
  def hasListeners(eventType: String): Boolean =
    listeners.getOrDefault(eventType, Nil).nonEmpty

  /** Register `listener` for `eventType`, keeping priority order stable
    * (ties preserve registration order, like the reference's sorted
    * insert at the first index with priority >= new). */
  def register(eventType: String, listener: HookListener): Unit =
    listeners.compute(eventType, (_, cur) => {
      val l = if (cur == null) Nil else cur
      val (before, after) = l.span(_.priority <= listener.priority)
      before ::: listener :: after
    })

  /** Remove a previously [[register]]ed listener (reference identity) so
    * bounded-lifetime observers — e.g. a server's commit-signal listener
    * — don't accumulate on a shared engine across restarts. No-op if the
    * listener isn't registered. */
  def unregister(eventType: String, listener: HookListener): Unit = {
    listeners.compute(eventType, (_, cur) => {
      val l = if (cur == null) Nil else cur.filterNot(_ eq listener)
      if (l.isEmpty) null else l
    })
    ()
  }

  /** Fire `event`. For Pre events: sync, priority order, first
    * `Left`/throw cancels (returned as `Left`) and skips the rest. For
    * Post events: sync listeners inline (errors counted, never
    * propagated), async listeners submitted to the pool and tracked for
    * [[stop]]. Always `Right(())` for Post events. */
  def trigger(event: HookEvent): Either[String, Unit] = {
    val regs = listeners.getOrDefault(event.eventType, Nil)
    if (regs.isEmpty) return Right(())
    if (EventType.isPre(event.eventType)) {
      // Pre hooks are always synchronous so they can veto (`hooks.go:612`).
      regs.foreach { l =>
        val r = try l.onEvent(event)
          catch { case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
        r match {
          case Left(err) =>
            return Left(s"pre-hook for event ${event.eventType} " +
              s"(priority ${l.priority}) failed: $err")
          case Right(()) => ()
        }
      }
      Right(())
    } else {
      regs.foreach { l =>
        if (l.isAsync) {
          inflight.incrementAndGet()
          asyncPool.execute { () =>
            try {
              if (runCounting(l, event).isLeft) ()
            } finally {
              inflight.decrementAndGet()
              lock.synchronized(lock.notifyAll())
            }
          }
        } else runCounting(l, event)
      }
      Right(())
    }
  }

  private def runCounting(l: HookListener, event: HookEvent): Either[String, Unit] = {
    val r = try l.onEvent(event)
      catch { case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
    if (r.isLeft) postErrors.incrementAndGet()
    r
  }

  /** Await all in-flight async listeners (`hooks.go:651-654`). The
    * manager stays usable afterwards. */
  def stop(): Unit = lock.synchronized {
    while (inflight.get() > 0) lock.wait(50)
  }
}
