package graft.tsdb

/** Delete markers, mirroring the reference's three tombstone kinds
  * (`core/entry.go:12-40`, SURVEY §2.3 M2-M4). A tombstone hides every
  * matching point whose write sequence number is <= the tombstone's —
  * so a point written AFTER a delete survives it
  * (`engine2/adapter.go:2784, :4035`). Ranges are inclusive on both ends.
  */
sealed trait Tombstone {
  def metric: String
  def tags: Map[String, String]
  def seq: Long
  def seriesKey: String = SeriesKey.of(metric, tags)
}
final case class PointTombstone(metric: String, tags: Map[String, String],
    timestamp: Long, seq: Long) extends Tombstone
final case class SeriesTombstone(metric: String, tags: Map[String, String],
    seq: Long) extends Tombstone
final case class RangeTombstone(metric: String, tags: Map[String, String],
    startNs: Long, endNs: Long, seq: Long) extends Tombstone

/** Canonical string series key: `metric  k=v  k=v ...` with
  * tag keys sorted — same shape as the reference's legacy string key
  * (`core/tsdb_keys.go:184-212`). Spark-side the dictionary/ID encoding the
  * reference maintains by hand (`indexer/string_store.go`) is subsumed by
  * Parquet dictionary encoding, so the string form is only ever used for
  * grouping/ordering, never stored. */
object SeriesKey {
  val Sep = "\u0001"
  def of(metric: String, tags: Map[String, String]): String =
    if (tags.isEmpty) metric
    else metric + Sep + tags.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(Sep)
}
