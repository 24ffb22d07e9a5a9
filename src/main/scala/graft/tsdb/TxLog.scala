package graft.tsdb

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.JavaConverters._

/** One committed transaction in the storage log. All file paths are
  * data-root-relative (`metric=<m>/date=<d>/<file>.parquet`). */
final case class LogCommit(
    version: Long,
    adds: Seq[String] = Nil,
    removes: Seq[String] = Nil,
    tombs: Seq[TsdbEngine.TombRow] = Nil,
    /** compaction: drop every tombstone recorded up to this commit. */
    clearTombs: Boolean = false,
    /** metrics this commit touches — per-metric cache epochs key off it. */
    metrics: Seq[String] = Nil,
    /** `date` partition values this commit touches. Recorded for L0
      * commits (whose file paths carry no `date=` segment to parse);
      * hive-layout commits leave it empty and derive dates from paths. */
    dates: Seq[String] = Nil,
    /** Rows committed INLINE in this manifest ([[InlineRows]] blob) —
      * the WAL/memtable shape for small driver-side batches: durable at
      * the commit rename, no data file, no Spark job. Folded into the
      * clustered layout by threshold compaction (`clearInline`). */
    inline: Option[String] = None,
    /** compaction: drop every inline blob recorded up to this commit
      * (its rows were rewritten as files in this same commit's adds).
      * ADMIN-op semantics (compact/restore, like `clearTombs`): it wipes
      * everything live at replay, so it must not race concurrent inline
      * writers — the concurrent-safe fold records [[foldedInline]]. */
    clearInline: Boolean = false,
    /** EXACT inline-commit versions this commit folded into its adds —
      * the concurrency-safe memtable flush: an inline commit landing
      * between the folder's snapshot and its commit is untouched (a
      * blunt clear would wipe rows that were never folded). */
    foldedInline: Seq[Long] = Nil,
    /** idempotent-writer watermark (streaming exactly-once): a commit
      * carrying (app, batch) <= the recorded watermark is a replay. */
    txnApp: Option[String] = None,
    txnBatch: Option[Long] = None,
    /** write-sequence high-water mark (restart seeds the seq counter). */
    maxSeq: Long = 0L)

/** Materialized state of the log at some version. */
final case class LogSnapshot(
    version: Long,
    files: Vector[String],
    tombs: Vector[TsdbEngine.TombRow],
    metricEpoch: Map[String, Long],
    txns: Map[String, Long],
    maxSeq: Long,
    /** L0 file → (metrics, dates) it contains, from its commit's recorded
      * sets — the path-parse equivalent for files whose layout carries
      * metric/date as COLUMNS instead of directory segments. Per-metric
      * file selection and touched-date derivation read this; a file
      * absent from the map (pre-L0 log) is handled conservatively. */
    l0Keys: Map[String, (Seq[String], Seq[String])] = Map.empty,
    /** Live INLINE commits (not yet folded into files), oldest first. */
    inline: Vector[InlineCommit] = Vector.empty) {
  def txnSeen(app: String, batch: Long): Boolean = txns.get(app).exists(_ >= batch)
}

/** One live inline commit: its version, row blob ([[InlineRows]]) and
  * recorded metric/date sets (for per-metric selection without decode). */
final case class InlineCommit(version: Long, blob: String,
    metrics: Seq[String], dates: Seq[String])

object LogSnapshot {
  val empty: LogSnapshot =
    LogSnapshot(0L, Vector.empty, Vector.empty, Map.empty, Map.empty, 0L)
}

/** A minimal ACID commit log over a directory of parquet files — the
  * transactional half of the lakehouse design (what Delta Lake's
  * `_delta_log` provides; reimplemented here because the environment
  * ships no Delta jars). Cf. the reference's WAL+manifest pairing
  * (`wal/wal.go:53-60`, `engine2/levels_manifest.go`): there the WAL
  * makes un-flushed writes recoverable; here a data file is INVISIBLE
  * until the commit that references it lands, so a crash mid-write tears
  * nothing — readers only ever see the file set of the latest committed
  * version.
  *
  * Commit protocol: serialize the commit as JSON to a temp file, then
  * atomically rename it to `<version+1 zero-padded>.json`. Rename without
  * REPLACE_EXISTING fails if the version was taken — the loser re-reads
  * and retries (optimistic concurrency, same CAS as Delta's
  * put-if-absent). On a local or HDFS-like filesystem the rename is
  * atomic; on S3 this slot would be a DynamoDB/conditional-put, which is
  * exactly how Delta handles it too.
  */
final class TxLog(logDirPath: String) {

  private val logDir = Paths.get(logDirPath)
  private implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats

  private def fileOf(v: Long): Path = logDir.resolve(f"$v%020d.json")

  def latestVersion(): Long =
    if (!Files.isDirectory(logDir)) 0L
    else Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .foldLeft(0L)(math.max)

  def read(v: Long): LogCommit =
    org.json4s.jackson.Serialization.read[LogCommit](Files.readString(fileOf(v)))

  /** Wall-clock the commit at `v` landed (the commit file's mtime) —
    * backs grace-period vacuum's dereference times without a log-format
    * change. */
  def commitFileMtimeMs(v: Long): Long =
    Files.getLastModifiedTime(fileOf(v)).toMillis

  /** Atomically commit at the next free version. `build` receives the
    * version it will land at (losers of a race rebuild and retry).
    *
    * The publish step is `Files.createLink` (hard link), NOT a rename:
    * POSIX rename() silently REPLACES an existing target — two racing
    * writers would both "succeed" and one commit would vanish — while
    * link() fails with EEXIST, giving a true put-if-absent. */
  def commit(build: Long => LogCommit): LogCommit = {
    Files.createDirectories(logDir)
    var attempts = 0
    while (attempts < 10000) {
      val v = latestVersion() + 1
      val c = build(v)
      require(c.version == v, "commit must carry the version it was built for")
      val tmp = logDir.resolve(s".${java.util.UUID.randomUUID()}.tmp")
      Files.writeString(tmp, org.json4s.jackson.Serialization.write(c))
      try {
        Files.createLink(fileOf(v), tmp)
        Files.deleteIfExists(tmp)
        return c
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the race — rebuild against the new tip
          attempts += 1
      }
    }
    throw new IllegalStateException("commit contention: lost every race")
  }

  /** Replay commits (base.version, upTo] on top of `base`. */
  def replay(base: LogSnapshot = LogSnapshot.empty,
      upTo: Long = Long.MaxValue): LogSnapshot = {
    val tip = math.min(latestVersion(), upTo)
    var files = base.files
    var tombs = base.tombs
    var metricEpoch = base.metricEpoch
    var txns = base.txns
    var maxSeq = base.maxSeq
    var l0Keys = base.l0Keys
    var inline = base.inline
    var v = base.version + 1
    while (v <= tip) {
      val c = read(v)
      if (c.removes.nonEmpty) {
        val dead = c.removes.toSet
        files = files.filterNot(dead)
        l0Keys = l0Keys.removedAll(c.removes.filter(TxLog.isL0))
      }
      files = files ++ c.adds
      val l0Adds = c.adds.filter(TxLog.isL0)
      if (l0Adds.nonEmpty)
        l0Keys = l0Keys ++ l0Adds.map(_ -> ((c.metrics, c.dates)))
      if (c.clearInline) inline = Vector.empty
      if (c.foldedInline.nonEmpty) {
        val folded = c.foldedInline.toSet
        inline = inline.filterNot(ic => folded.contains(ic.version))
      }
      c.inline.foreach(b =>
        inline = inline :+ InlineCommit(v, b, c.metrics, c.dates))
      if (c.clearTombs) tombs = Vector.empty
      tombs = tombs ++ c.tombs
      metricEpoch = metricEpoch ++ c.metrics.map(_ -> v)
      for (app <- c.txnApp; b <- c.txnBatch)
        txns = txns.updated(app, math.max(b, txns.getOrElse(app, Long.MinValue)))
      maxSeq = math.max(maxSeq, c.maxSeq)
      v += 1
    }
    LogSnapshot(tip, files, tombs, metricEpoch, txns, maxSeq, l0Keys, inline)
  }
}

object TxLog {
  /** Data-root-relative paths of LEVEL-0 files: unpartitioned parquet
    * carrying metric/date as columns (small streaming micro-batch
    * commits land here; compaction migrates them into the hive layout —
    * the memtable-flush / L0-SSTable shape of an LSM, cf. the
    * reference's `engine2/levels_manifest.go` level 0). */
  def isL0(f: String): Boolean = f.startsWith("l0/")
}
