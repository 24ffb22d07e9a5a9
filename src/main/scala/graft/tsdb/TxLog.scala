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
    /** restore: drop every tombstone recorded up to this commit. ADMIN-op
      * semantics — wipes everything live at replay, so it must not race
      * concurrent deleters; the concurrency-safe compaction fold records
      * [[clearTombsUpToSeq]] instead. */
    clearTombs: Boolean = false,
    /** compaction: drop tombstones with seq <= this bound — exactly the
      * ones the rewrite applied. A delete landing between the compactor's
      * snapshot and its commit minted a HIGHER seq (seqs are monotonic),
      * so it survives the clear and still shadows the rewritten rows at
      * read time (rows keep their seqs) — the tombstone twin of
      * [[foldedInline]]. */
    clearTombsUpToSeq: Option[Long] = None,
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

/** JSON shape of a CHECKPOINT manifest — a full [[LogSnapshot]]
  * materialized at one version, so replay starts here instead of
  * genesis (Delta's checkpoint-parquet + `_last_checkpoint` pairing;
  * the reference bounds its log the same way — WAL segments rotate and
  * are deleted after flush, `wal/wal.go:53-60`, and the levels manifest
  * is REWRITTEN, not replayed from history,
  * `engine2/levels_manifest.go`). `l0Keys` flattens the snapshot's
  * tuple-valued map into rows (json4s round-trips case classes, not
  * tuples).
  *
  * Above [[TxLog.filesSidecarThreshold]] live files, the `files` list —
  * the only component that grows with TABLE SIZE rather than with
  * activity — moves OUT of the JSON into a newline-separated sidecar
  * (`<v>.checkpoint.files`, `externalFiles = true`): at ~800k files
  * (100 TB / 128 MB) the inline JSON list is ~40 MB serialized on the
  * committing writer's thread every checkpoint interval and parsed
  * whole on every replay (`ProbeCkptCost` at 1M: 203 ms write / 513 ms
  * read), while the sidecar is a straight buffered byte copy both ways
  * — Delta's parquet-checkpoint move, sized to this engine (the
  * reference likewise keeps its manifest a bounded binary
  * `CURRENT`/manifest pair, `snapshot/manager.go`, never a growing
  * JSON blob). Paths never contain newlines: they are produced by
  * Spark's partition-escaped writers (control chars %XX-escaped).
  * Checkpoints written before this format (no flag) read unchanged. */
final case class CheckpointL0Key(file: String, metrics: Seq[String],
    dates: Seq[String])
final case class CheckpointState(
    version: Long, files: Seq[String], tombs: Seq[TsdbEngine.TombRow],
    metricEpoch: Map[String, Long], txns: Map[String, Long], maxSeq: Long,
    l0Keys: Seq[CheckpointL0Key] = Nil,
    inline: Seq[InlineCommit] = Nil,
    externalFiles: Boolean = false) {
  def toSnapshot: LogSnapshot = LogSnapshot(version, files.toVector,
    tombs.toVector, metricEpoch, txns, maxSeq,
    l0Keys.map(k => k.file -> ((k.metrics, k.dates))).toMap,
    inline.toVector)
}
object CheckpointState {
  def of(s: LogSnapshot): CheckpointState = CheckpointState(s.version,
    s.files, s.tombs, s.metricEpoch, s.txns, s.maxSeq,
    s.l0Keys.toSeq.sortBy(_._1).map { case (f, (ms, ds)) =>
      CheckpointL0Key(f, ms, ds) },
    s.inline)
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
  private def ckptFileOf(v: Long): Path =
    logDir.resolve(f"$v%020d.checkpoint.json")
  private def ckptFilesOf(v: Long): Path =
    logDir.resolve(f"$v%020d.checkpoint.files")
  private val lastCkptHintFile = logDir.resolve("_last_checkpoint")

  /** Commit-manifest file names are exactly 20 digits + ".json" —
    * checkpoints carry ".checkpoint.json" and the hint file has no
    * version; both must never parse as commits. */
  private def commitVersionOf(name: String): Option[Long] =
    if (name.length == 25 && name.endsWith(".json") &&
        name.take(20).forall(_.isDigit)) Some(name.take(20).toLong)
    else None

  /** Versions of all commit manifests still present (ascending). Bounded
    * by [[truncate]] — pre-checkpoint manifests are vacuumed, so this
    * listing is O(checkpoint interval + grace window), never O(total
    * commits ever). */
  def availableCommitVersions(): Seq[Long] =
    if (!Files.isDirectory(logDir)) Nil
    else {
      val s = Files.list(logDir)
      try s.iterator().asScala
        .flatMap(p => commitVersionOf(p.getFileName.toString))
        .toSeq.sorted
      finally s.close()
    }

  private def checkpointVersions(): Seq[Long] =
    if (!Files.isDirectory(logDir)) Nil
    else {
      val s = Files.list(logDir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.length == 36 && n.endsWith(".checkpoint.json") &&
          n.take(20).forall(_.isDigit))
        .map(_.take(20).toLong).toSeq.sorted
      finally s.close()
    }

  /** In-memory tip cache: commits are DENSE (the put-if-absent link
    * allocates versions without gaps), so once a tip is known the next
    * one is found by probing `tip+1` — `latestVersion()` stops listing
    * the directory on every commit (the r13 write path lands 100-200
    * commits/s; a listing per commit is quadratic in history). -1 =
    * not yet initialized; initialization pays ONE listing. */
  private val tipHint = new java.util.concurrent.atomic.AtomicLong(-1L)

  def latestVersion(): Long = {
    if (!Files.isDirectory(logDir)) return 0L
    var v = tipHint.get()
    // self-heal a stale hint: the log can be REPLACED under a live
    // instance (restore() swaps the whole directory for a snapshot with
    // a shorter history) — a cached tip pointing past the real one must
    // re-list, or replay would walk into missing manifests
    if (v > 0L && !Files.exists(fileOf(v)) && !Files.exists(ckptFileOf(v))) {
      tipHint.set(-1L)
      ckptHint.set(-1L)
      v = -1L
    }
    if (v < 0L)
      v = availableCommitVersions()
        .foldLeft(checkpointVersions().foldLeft(0L)(math.max))(math.max)
    var probing = true
    while (probing) {
      while (Files.exists(fileOf(v + 1))) v += 1
      probing = false
      // Stalled with the tip COMMIT itself missing — not a healthy tip
      // (a live tip's own manifest exists): an instance lagging past a
      // FOREIGN truncation, or a checkpoint-only directory. One ~50-byte
      // hint-file read settles it; the healthy hot path (tip manifest
      // present) never pays it.
      if (v == 0L || !Files.exists(fileOf(v)))
        readCkptHintFile().filter(_ > v).foreach { hv =>
          ckptHint.getAndAccumulate(hv, math.max(_, _))
          v = hv
          probing = true
        }
    }
    tipHint.getAndAccumulate(v, math.max(_, _))
    v
  }

  def read(v: Long): LogCommit =
    try org.json4s.jackson.Serialization.read[LogCommit](
      Files.readString(fileOf(v)))
    catch {
      case e: java.nio.file.NoSuchFileException =>
        throw new IllegalStateException(
          s"commit manifest $v is gone (truncated past a checkpoint " +
            "or never written); replay from a covering checkpoint", e)
    }

  // ---- checkpoints --------------------------------------------------------

  /** Version of the newest checkpoint manifest, from the advisory
    * `_last_checkpoint` hint when valid, else a directory listing.
    * In-memory cached; [[writeCheckpoint]] advances it. */
  private val ckptHint = new java.util.concurrent.atomic.AtomicLong(-1L)

  def latestCheckpoint(upTo: Long = Long.MaxValue): Option[Long] = {
    var h = ckptHint.get()
    // validate a cached hint against the filesystem: a FOREIGN process
    // (shared-storage follower / multi-engine is a supported model) can
    // truncate the checkpoint this instance cached (keepCheckpoints
    // bounds survivors); returning the stale hint would send replay's
    // jump into a missing file — and the hint would stay poisoned until
    // restart. One Files.exists per call; reset + re-list on a miss.
    if (h > 0L && !Files.exists(ckptFileOf(h))) {
      ckptHint.compareAndSet(h, -1L)
      h = ckptHint.get()
    }
    if (h <= 0L) {
      // "no checkpoint yet" is NOT a cacheable verdict: a FOREIGN
      // process (or an admin tool) can write the first checkpoint at
      // any time, and a 0 cached as final would hide it from this
      // instance forever — replay would survive only via its listing
      // fallback while commitsSinceCheckpoint and replication gap
      // resolution silently failed (caught by the r16 mid-walk
      // replication spec). Re-resolving costs one ~50-byte hint read
      // (plus a listing only while the hint is absent), and is paid
      // only until the first checkpoint lands — then h > 0 caches.
      h = readCkptHintFile().filter(v => Files.exists(ckptFileOf(v)))
        .getOrElse(checkpointVersions().foldLeft(0L)(math.max))
      ckptHint.getAndAccumulate(h, math.max(_, _))
      h = ckptHint.get()
    }
    if (h <= upTo) { if (h > 0L) Some(h) else None }
    else checkpointVersions().filter(_ <= upTo).maxOption // time travel below the hint
  }

  private def readCkptHintFile(): Option[Long] =
    if (!Files.exists(lastCkptHintFile)) None
    else scala.util.Try {
      (org.json4s.jackson.JsonMethods.parse(
        Files.readString(lastCkptHintFile)) \ "version")
        .extract[Long]
    }.toOption

  def readCheckpoint(v: Long): LogSnapshot = {
    val state = org.json4s.jackson.Serialization.read[CheckpointState](
      Files.readString(ckptFileOf(v)))
    val snap = state.toSnapshot
    if (!state.externalFiles) snap
    else {
      // sidecar read: one buffered line walk, no JSON tokenizer in the
      // O(table-size) path
      val files = Vector.newBuilder[String]
      val br = Files.newBufferedReader(ckptFilesOf(v),
        java.nio.charset.StandardCharsets.UTF_8)
      try {
        var line = br.readLine()
        while (line != null) { files += line; line = br.readLine() }
      } finally br.close()
      snap.copy(files = files.result())
    }
  }

  /** Materialize `s` as a checkpoint manifest (put-if-absent — two
    * engines checkpointing the same version dedupe) and advance the
    * `_last_checkpoint` hint. The hint write is advisory: readers fall
    * back to a listing, so a torn/stale hint costs a listing, never
    * correctness. Large file lists go to the `.checkpoint.files`
    * sidecar, linked BEFORE the JSON manifest — a reader that can see
    * the manifest can always see the sidecar (same files-before-
    * manifest invariant data commits have); a crash in between leaves
    * an invisible orphan sidecar that [[truncate]] collects with its
    * manifest version. */
  def writeCheckpoint(s: LogSnapshot): Unit = {
    require(s.version > 0L, "cannot checkpoint the empty snapshot")
    Files.createDirectories(logDir)
    val external = s.files.size >= TxLog.filesSidecarThreshold
    if (external) {
      val ftmp = logDir.resolve(s".ckptf-${java.util.UUID.randomUUID()}.tmp")
      val w = Files.newBufferedWriter(ftmp,
        java.nio.charset.StandardCharsets.UTF_8)
      try s.files.foreach { f => w.write(f); w.write('\n') }
      finally w.close()
      try Files.createLink(ckptFilesOf(s.version), ftmp)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      Files.deleteIfExists(ftmp)
    }
    val state =
      if (external) CheckpointState.of(s.copy(files = Vector.empty))
        .copy(externalFiles = true)
      else CheckpointState.of(s)
    val tmp = logDir.resolve(s".ckpt-${java.util.UUID.randomUUID()}.tmp")
    Files.writeString(tmp, org.json4s.jackson.Serialization.write(state))
    try Files.createLink(ckptFileOf(s.version), tmp)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    Files.deleteIfExists(tmp)
    ckptHint.getAndAccumulate(s.version, math.max(_, _))
    if (readCkptHintFile().forall(_ < s.version)) {
      val t2 = logDir.resolve(s".ckpt-hint-${java.util.UUID.randomUUID()}.tmp")
      Files.writeString(t2, s"""{"version":${s.version}}""")
      Files.move(t2, lastCkptHintFile, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** Commits at the tip not yet covered by a checkpoint — the engine's
    * checkpoint-interval trigger reads this instead of listing. */
  def commitsSinceCheckpoint(tip: Long): Long =
    tip - latestCheckpoint(tip).getOrElse(0L)

  /** Vacuum the log: delete commit manifests at or below the OLDEST KEPT
    * checkpoint (their state is materialized there — including their
    * dead inline blobs, which otherwise live in the JSON forever), and
    * checkpoints older than the `keepCheckpoints` newest. Both only
    * once the file is `graceMs` old, the same discipline data-file
    * vacuum applies: a lagging follower or an in-flight reader keeps a
    * consistent view for the grace window, and time travel reaches back
    * to the oldest surviving checkpoint. Returns files deleted. */
  def truncate(graceMs: Long, keepCheckpoints: Int = 2): Int = {
    val cks = checkpointVersions()
    if (cks.isEmpty) return 0
    val kept = cks.takeRight(math.max(1, keepCheckpoints))
    val bound = kept.min
    val now = System.currentTimeMillis()
    val cutoff = now - math.max(0L, graceMs)
    var deleted = 0
    def tryDelete(p: Path): Unit =
      try {
        if (Files.exists(p) &&
            Files.getLastModifiedTime(p).toMillis < cutoff &&
            Files.deleteIfExists(p)) deleted += 1
      } catch {
        // a concurrent truncator (another thread or process) won the
        // race between the exists check and the mtime read — the file
        // is gone, which is exactly the outcome wanted
        case _: java.nio.file.NoSuchFileException => ()
      }
    availableCommitVersions().takeWhile(_ <= bound).foreach(v => tryDelete(fileOf(v)))
    cks.dropRight(math.max(1, keepCheckpoints)).foreach { v =>
      tryDelete(ckptFileOf(v))
      // the sidecar dies WITH its manifest (manifest-first, so no
      // reader window sees a manifest whose sidecar is gone); once the
      // manifest is gone the sidecar is unreachable — no grace needed
      if (!Files.exists(ckptFileOf(v))) Files.deleteIfExists(ckptFilesOf(v))
    }
    // Record the bound any truncation-lost dereference obeys: a deleted
    // commit manifest was ≥ graceMs old, so any file-remove it recorded
    // happened at or before (now − graceMs). Data-file vacuum raises its
    // own-mtime fallback to this bound, so a vacuum grace LARGER than
    // the truncation grace still never deletes early (the own write
    // mtime alone underestimates the dereference time). Advisory +
    // monotone: a torn write costs at most a later stray deletion.
    if (deleted > 0) {
      val prior = lastTruncationBoundMs().getOrElse(Long.MinValue)
      if (cutoff > prior)
        try {
          val tmp = logDir.resolve(s".trunc-${java.util.UUID.randomUUID()}.tmp")
          Files.writeString(tmp, s"""{"boundMs":$cutoff}""")
          Files.move(tmp, lastTruncFile, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
        } catch { case _: java.io.IOException => () }
    }
    deleted
  }

  private val lastTruncFile = logDir.resolve("_last_truncation")

  /** Upper bound (wall-clock ms) on the dereference time of any data
    * file whose removing commit manifest has been truncated away —
    * `None` when no truncation was ever recorded (every remove is still
    * readable from the log). */
  def lastTruncationBoundMs(): Option[Long] =
    if (!Files.exists(lastTruncFile)) None
    else scala.util.Try {
      (org.json4s.jackson.JsonMethods.parse(
        Files.readString(lastTruncFile)) \ "boundMs").extract[Long]
    }.toOption

  /** On-disk locations, for replication shipping (the engine copies
    * manifests file-for-file; names are format-private otherwise).
    * A checkpoint's files SIDECAR, when present, must ship BEFORE its
    * manifest — same invariant as data files before commits. */
  def commitPath(v: Long): Path = fileOf(v)
  def checkpointPath(v: Long): Path = ckptFileOf(v)
  def checkpointFilesPath(v: Long): Path = ckptFilesOf(v)
  def hasCommit(v: Long): Boolean = Files.exists(fileOf(v))

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
        tipHint.getAndAccumulate(v, math.max(_, _))
        return c
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the race — rebuild against the new tip
          attempts += 1
      }
    }
    throw new IllegalStateException("commit contention: lost every race")
  }

  /** Replay commits (base.version, upTo] on top of `base`. A cold start
    * (or a follower lagging past a truncation boundary) jumps to the
    * newest CHECKPOINT ≤ `upTo` first and replays only the commits
    * after it — O(checkpoint interval), never O(total commits ever).
    * An incremental refresh (live `base` at or past the checkpoint)
    * takes the plain tail walk it always did.
    *
    * Truncation can race the WALK, not just the jump decision: the
    * `fileOf(start+1)` existence check passes, then a concurrent
    * truncator deletes commits in (start, tip] before [[replayTail]]
    * reads them (caught live by `ProbeCkptFuzz`: a follower `sync()`
    * died on "commit manifest 3 is gone" ~1/60 iterations under a
    * grace-0 foreign truncator). A manifest only ever disappears
    * because its state is materialized in a checkpoint ([[truncate]]
    * deletes at or below the oldest KEPT checkpoint), so the walk
    * retries with the jump FORCED — resolve the newest readable
    * checkpoint past `base` regardless of the existence probe and walk
    * again. Bounded retries; a genuinely uncovered gap (time travel
    * below the retained window) still fails with the original clean
    * error. */
  def replay(base: LogSnapshot = LogSnapshot.empty,
      upTo: Long = Long.MaxValue): LogSnapshot = {
    var attempt = 0
    while (true) {
      val tip = math.min(latestVersion(), upTo)
      var start = base
      if (start.version < tip &&
          (attempt > 0 || start.version == 0L ||
            !Files.exists(fileOf(start.version + 1)))) {
        // jump when starting cold, when the needed chain was truncated
        // (a lagging follower across a checkpoint boundary), or on a
        // RETRY after a mid-walk truncation: the hint first; a LISTING
        // retry when the hint is stale — a foreign process may have
        // checkpointed without this instance noticing. readCheckpoint
        // itself races foreign truncation (the file can vanish between
        // the exists-check inside latestCheckpoint and the read) — on
        // a miss, drop the poisoned hint and take the newest LISTED
        // checkpoint that still reads.
        def tryRead(cv: Long): Option[LogSnapshot] =
          try Some(readCheckpoint(cv))
          catch {
            case _: java.nio.file.NoSuchFileException =>
              ckptHint.compareAndSet(cv, -1L); None
          }
        latestCheckpoint(tip).filter(_ > start.version).flatMap(tryRead)
          .orElse(checkpointVersions().filter(v =>
            v > start.version && v <= tip).sorted.reverseIterator
            .flatMap(tryRead(_)).nextOption())
          .foreach(s => start = s)
      }
      try return replayTail(start, tip)
      catch {
        case e: IllegalStateException =>
          attempt += 1
          if (attempt >= 5) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def replayTail(base: LogSnapshot, tip: Long): LogSnapshot = {
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
      c.clearTombsUpToSeq.foreach(b => tombs = tombs.filter(_.seq > b))
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

  /** Live-file count above which [[TxLog.writeCheckpoint]] moves the
    * `files` list out of the checkpoint JSON into the newline sidecar.
    * Below it the single-JSON format is both faster (one file, one
    * parse) and probed flat (`ProbeCkptCost`: ≤5 ms at 10k); the
    * sidecar wins where JSON tokenization dominates. Mutable as a test
    * seam only — both formats are always readable. */
  @volatile private[graft] var filesSidecarThreshold: Int = 10000
}
