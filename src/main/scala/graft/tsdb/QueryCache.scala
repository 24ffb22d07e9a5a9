package graft.tsdb

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Query-result cache with the reference's canonical key semantics
  * (`api/nbql/cache_key.go:17-60`): tags sorted, RELATIVE ranges keyed by
  * duration (not resolved instants) so repeating relative queries hit,
  * while absolute ranges key on exact bounds. Entries are invalidated by
  * write epoch — any put/delete bumps the engine epoch and orphans every
  * older entry (the reference invalidates on flush; epoch is stricter and
  * race-free).
  *
  * Driver-side LRU over COLLECTED results, capped per entry: this caches
  * serving-layer answers (the reference's use case — dashboards repeating
  * the same NBQL), never intermediate distributed state, so it adds no
  * executor memory pressure at scale. */
final class QueryCache(capacity: Int = 256, maxRowsPerEntry: Int = 100000) {

  final case class Entry(epoch: Long, rows: Array[Row], schema: StructType)

  private val lru = new java.util.LinkedHashMap[String, Entry](capacity, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Entry]): Boolean =
      size() > capacity
  }

  private var hitCount = 0L
  private var missCount = 0L

  /** Canonical key: metric, sorted tags, range (REL:duration vs ABS:a-b),
    * aggs in declaration order, downsample/order/limit/cursor. */
  def keyOf(p: QueryParams): String = {
    val tags = p.tags.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
    val range = p.relativeNs match {
      case Some(d) => s"REL:$d"
      case None => s"ABS:${p.startNs}-${p.endNs.getOrElse(0L)}"
    }
    val aggs = p.aggs.map(a => s"${a.func}(${a.field})${a.alias.getOrElse("")}").mkString(",")
    s"${p.metric}|$tags|$range|$aggs|${p.downsampleNs.getOrElse(0L)}|" +
      s"${p.emitEmptyWindows}|${p.fill}|${p.order}|${p.limit.getOrElse(-1L)}|" +
      s"${p.afterKey.map(_.encode).getOrElse("")}|" +
      p.valueFilters.map(f => s"${f.field}${f.op}${f.value}").mkString(",")
  }

  def get(p: QueryParams, currentEpoch: Long): Option[(Array[Row], StructType)] =
    synchronized {
      Option(lru.get(keyOf(p))) match {
        case Some(e) if e.epoch == currentEpoch =>
          hitCount += 1; Some((e.rows, e.schema))
        case Some(_) => lru.remove(keyOf(p)); missCount += 1; None // stale epoch
        case None => missCount += 1; None
      }
    }

  def put(p: QueryParams, epoch: Long, rows: Array[Row], schema: StructType): Unit =
    synchronized {
      if (rows.length <= maxRowsPerEntry) lru.put(keyOf(p), Entry(epoch, rows, schema))
    }

  def stats: (Long, Long) = synchronized((hitCount, missCount))
  def size: Int = synchronized(lru.size())
}
