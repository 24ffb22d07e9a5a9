package graft

import graft.model.{DataPoint, FieldValue}
import graft.tsdb._
import java.nio.file.{Files, Paths}
import scala.collection.JavaConverters._

/** Commit-log CHECKPOINTING (round 14): every [[TsdbEngine
  * .checkpointInterval]] commits the engine materializes the full
  * [[LogSnapshot]] as a checkpoint manifest and truncates pre-checkpoint
  * commit JSONs under the grace discipline — so `latestVersion()` is
  * O(1) (tip cache + dense-version probing), restart replay reads
  * O(interval) manifests instead of every manifest ever written, and
  * dead inline blobs stop living in the log forever. The reference
  * bounds its log identically: WAL segments rotate and are deleted
  * after flush (`wal/wal.go:53-60`, `keep` at
  * `cmd/server/config.yaml:46-53`) and the levels manifest is
  * rewritten, not replayed from genesis (`engine2/levels_manifest.go`).
  *
  * Pinned here: bounded replay after restart; follower `sync()` across
  * a truncation boundary; replication shipping a checkpoint over a
  * truncated gap; time travel inside / clean failure outside the
  * retained window; full state round-trip through the checkpoint
  * (inline rows, tombstones, L0 keys, txn watermarks, seq HWM). */
class CheckpointSpec extends SparkSpec {

  private def withDir(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  private def pt(m: String, host: String, ts: Long, v: Double): DataPoint =
    DataPoint(m, Map("host" -> host), ts, Map("value" -> FieldValue.ofDouble(v)))

  private def count(e: TsdbEngine, m: String): Long =
    e.query(QueryParams(m, startNs = 0L, endNs = Some(1L << 60))).count()

  private def tuned(e: TsdbEngine): TsdbEngine = {
    e.checkpointInterval = 8
    e.foldVacuumGraceMs = 0L // immediate truncation, so tests see it
    e
  }

  test("restart replay is bounded: the log dir holds O(interval) " +
      "manifests and a fresh engine reads checkpoint + tail only") {
    withDir { dir =>
      val e = tuned(new TsdbEngine(spark, s"$dir/db"))
      // mixed commit kinds so the checkpoint round-trips EVERY field:
      // inline puts, an L0 txn batch, a delete, a txn watermark
      (0 until 10).foreach(i =>
        assert(e.putBatch(Seq(pt("m", "h1", i * 1000L, i.toDouble))).isRight))
      import SparkTestSession.spark.implicits._
      e.putDF(Seq(TsdbEngine.StoredPoint("m", Map("host" -> "h2"), 500L,
        Map("value" -> TsdbEngine.StoredValue(Some(42.0), None, None, None)),
        e.nextSeq())).toDF(), txn = Some(("ckpt-app", 7L)))
      assert(e.deletePoint("m", Map("host" -> "h1"), 0L).isRight)
      (10 until 30).foreach(i =>
        assert(e.putBatch(Seq(pt("m", "h1", i * 1000L, i.toDouble))).isRight))
      val expect = e.query(QueryParams("m", startNs = 0L,
        endNs = Some(1L << 60))).collect().map(_.toSeq).toSet
      assert(expect.size == 30) // 31 written, 1 tombstoned

      val log = new TxLog(s"$dir/db/_log")
      val avail = log.availableCommitVersions()
      assert(avail.size <= 2 * e.checkpointInterval,
        s"log must truncate below the oldest kept checkpoint, " +
          s"${avail.size} commit manifests survive")
      assert(avail.head > 1, "genesis manifests must be gone")
      assert(log.latestCheckpoint().isDefined)

      // fresh engine: checkpoint + tail replay reproduces EVERYTHING —
      // rows (incl. inline + L0), the tombstone, the txn watermark, seq
      val e2 = new TsdbEngine(spark, s"$dir/db")
      assert(e2.version == e.version)
      assert(e2.query(QueryParams("m", startNs = 0L,
        endNs = Some(1L << 60))).collect().map(_.toSeq).toSet == expect)
      // the idempotence watermark survived the checkpoint: a replayed
      // micro-batch must still be dropped
      val before = e2.version
      e2.putDF(Seq(TsdbEngine.StoredPoint("m", Map("host" -> "h2"), 501L,
        Map("value" -> TsdbEngine.StoredValue(Some(1.0), None, None, None)),
        e2.nextSeq())).toDF(), txn = Some(("ckpt-app", 7L)))
      assert(e2.version == before,
        "txn watermark must survive checkpoint truncation")
    }
  }

  test("follower sync() across a checkpoint/truncation boundary is seamless") {
    withDir { dir =>
      val e1 = tuned(new TsdbEngine(spark, s"$dir/db"))
      assert(e1.putBatch(Seq(pt("m", "h0", 0L, 0.0))).isRight)
      val follower = new TsdbEngine(spark, s"$dir/db") // tips at v1
      assert(follower.version == 1L)
      (1 until 30).foreach(i =>
        assert(e1.putBatch(Seq(pt("m", s"h$i", i * 1000L, i.toDouble))).isRight))
      // precondition: the follower's next commit (v2) is truncated
      val log = new TxLog(s"$dir/db/_log")
      assert(log.availableCommitVersions().head > 2,
        "test setup: truncation must have passed the follower's tip")
      assert(follower.sync() == e1.version)
      assert(count(follower, "m") == 30,
        "the follower must rebuild from the checkpoint, not the gap")
    }
  }

  test("replicateTo ships a checkpoint over a truncated gap; the " +
      "disjoint-storage follower reads everything") {
    withDir { dir =>
      val e1 = tuned(new TsdbEngine(spark, s"$dir/db"))
      (0 until 30).foreach(i =>
        assert(e1.putBatch(Seq(pt("m", s"h$i", i * 1000L, i.toDouble))).isRight))
      assert(e1.compact().isRight) // give the checkpoint real data files
      (30 until 40).foreach(i =>
        assert(e1.putBatch(Seq(pt("m", s"h$i", i * 1000L, i.toDouble))).isRight))
      val shipped = e1.replicateTo(s"$dir/follower")
      assert(shipped == e1.version)
      val f = new TsdbEngine(spark, s"$dir/follower")
      assert(f.version == e1.version)
      assert(count(f, "m") == 40)
      // incremental: later commits ship as plain manifests
      (40 until 44).foreach(i =>
        assert(e1.putBatch(Seq(pt("m", s"h$i", i * 1000L, i.toDouble))).isRight))
      e1.replicateTo(s"$dir/follower")
      assert(f.sync() == e1.version)
      assert(count(f, "m") == 44)
    }
  }

  test("replicateTo recovers from a truncation hole MID-WALK by " +
      "shipping a covering checkpoint; the follower replays through it") {
    withDir { dir =>
      // the replay-TOCTOU's replication twin: the pre-walk gap check
      // passes (the follower's next commit exists), then commits
      // further along the walk are truncated — the shipper must
      // re-resolve and ship a covering checkpoint, and the follower's
      // replay (retry-jump) must recover through the dest-side hole
      val e1 = tuned(new TsdbEngine(spark, s"$dir/db"))
      e1.checkpointInterval = 0 // manual checkpoints only — no truncation
      (0 until 30).foreach(i =>
        assert(e1.putBatch(Seq(pt("m", s"h$i", i * 1000L, i.toDouble))).isRight))
      val log = new TxLog(s"$dir/db/_log")
      log.writeCheckpoint(log.replay())
      val tip = log.latestVersion()
      // carve the mid-walk hole: commit 1 stays (the gap check passes),
      // 2..tip-2 vanish as a concurrent truncation would leave them
      (2L to tip - 2).foreach(v => Files.delete(log.commitPath(v)))
      val shipped = e1.replicateTo(s"$dir/follower")
      assert(shipped == e1.version)
      val f = new TsdbEngine(spark, s"$dir/follower")
      assert(f.version == e1.version)
      assert(count(f, "m") == 30,
        "the follower must see every row through the mid-walk hole")
    }
  }

  test("time travel works back to the retained window; older versions " +
      "fail CLEANLY") {
    withDir { dir =>
      val e = tuned(new TsdbEngine(spark, s"$dir/db"))
      (0 until 30).foreach(i =>
        assert(e.putBatch(Seq(pt("m", "h1", i * 1000L, i.toDouble))).isRight))
      val log = new TxLog(s"$dir/db/_log")
      val oldestCommit = log.availableCommitVersions().head
      // inside the window: exact historical count
      assert(e.readAt(e.version - 1).count() == 29)
      assert(e.readAt(oldestCommit).count() == oldestCommit)
      // below the window: a clean Left, never silent wrong data
      val r = e.restoreVersion(2L)
      assert(r.isLeft && r.left.exists(_.contains("cannot restore")),
        s"pre-truncation restore must fail cleanly, got $r")
    }
  }

  test("a FOREIGN truncation of the cached checkpoint never poisons " +
      "latestCheckpoint or replay") {
    withDir { dir =>
      // shared-storage multi-engine is a supported model: another
      // process can delete the checkpoint this instance cached
      // (keepCheckpoints bounds survivors). The stale in-memory hint
      // must be re-validated against the filesystem — otherwise
      // replay's jump reads a missing file and every sync()/refresh
      // fails until restart (ADVICE r14, medium).
      val t = new TxLog(s"$dir/log")
      def add(l: TxLog, n: Int): Unit = (0 until n).foreach { _ =>
        l.commit(v => LogCommit(v,
          adds = Seq(f"metric=m/date=d/$v%03d.parquet"), metrics = Seq("m")))
      }
      add(t, 4)
      t.writeCheckpoint(t.replay()) // ckpt @4
      assert(t.latestCheckpoint().contains(4L)) // hint now CACHED
      // a foreign instance advances two more checkpoints and truncates:
      // ckpt @4 and all commits ≤ 8 die
      val foreign = new TxLog(s"$dir/log")
      add(foreign, 4)
      foreign.writeCheckpoint(foreign.replay()) // ckpt @8
      add(foreign, 4)
      foreign.writeCheckpoint(foreign.replay()) // ckpt @12
      foreign.truncate(graceMs = 0L, keepCheckpoints = 2)
      assert(!Files.exists(t.checkpointPath(4L)),
        "test setup: the cached checkpoint must be truncated")
      // the lagging instance self-heals: hint re-validated, replay jumps
      // to a checkpoint that still exists
      assert(t.latestCheckpoint().exists(_ >= 8L),
        "a stale cached hint must be dropped and re-resolved")
      val s = t.replay()
      assert(s.version == 12L && s.files.size == 12,
        s"replay must recover over the truncated gap, got v${s.version}")
    }
  }

  test("vacuum with a grace LARGER than the truncation grace never " +
      "deletes a dereferenced file early") {
    withDir { dir =>
      // a file whose removing commit was truncated falls to vacuum's
      // fallback deref estimate; the own write mtime UNDERESTIMATES the
      // dereference time, so it must be raised to the recorded
      // truncation bound (ADVICE r14) — otherwise raising vacuumGraceMs
      // above the truncation grace deletes reader-protected files early
      val e = new TsdbEngine(spark, s"$dir/db")
      e.checkpointInterval = 0 // manual checkpoint/truncation below
      e.vacuumGraceMs = 3600000L
      assert(e.putBatch(Seq(pt("m", "h1", 1000L, 1.0))).isRight)
      assert(e.compact().isRight) // inline → data file F1
      assert(e.putBatch(Seq(pt("m", "h2", 2000L, 2.0))).isRight)
      assert(e.compact().isRight) // rewrites: F1 dereferenced, kept by grace
      val live = e.readAt(e.version).count() // force a refresh-side read
      assert(live == 2)
      val dataRoot = Paths.get(s"$dir/db/data")
      def diskFiles() = {
        val w = Files.walk(dataRoot)
        try w.iterator().asScala.filter(
          _.getFileName.toString.endsWith(".parquet")).toVector
        finally w.close()
      }
      val dead = diskFiles().filterNot(p =>
        e.liveFilePaths.contains(dataRoot.relativize(p).toString))
      assert(dead.nonEmpty, "test setup: a dereferenced file must survive " +
        "under the 1h grace")
      // truncate the removing commits away (grace 0 — SMALLER than the
      // 1h vacuum grace) and age the dead file's mtime past the grace
      val log = new TxLog(s"$dir/db/_log")
      log.writeCheckpoint(log.replay())
      assert(log.truncate(graceMs = 0L, keepCheckpoints = 1) > 0)
      assert(log.lastTruncationBoundMs().isDefined,
        "truncation must record its bound")
      dead.foreach(p => Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 7200000L)))
      e.vacuum(3600000L)
      assert(dead.forall(Files.exists(_)),
        "the mtime fallback must be raised to the truncation bound — " +
          "a 2h-old mtime does not date a dereference the log no longer has")
      e.vacuum(0L)
      assert(dead.forall(!Files.exists(_)))
    }
  }

  test("fuzz: live ingest vs concurrent FOREIGN checkpoint+truncate, " +
      "follower sync and time travel — no lost rows, no poisoned reader") {
    // The r14 backpressure probe found its TOCTOU in exactly this class
    // (concurrent fold + commit interleavings); this fuzzes the
    // checkpoint/truncation side: an ingesting writer (threshold folds
    // riding it), a FOREIGN process checkpointing and truncating with
    // grace 0 (the most aggressive legal truncator), a lagging follower
    // sync()ing through the truncation boundary, and a time traveler
    // reading historical versions. Invariants: no thread throws
    // (IllegalStateException on a truncated-past readAt is the
    // documented clean failure), every acked row is durable, and the
    // follower converges to the writer's exact state.
    withDir(ckptTruncFuzz)
  }

  test("fuzz under the SIDECAR checkpoint format: identical invariants " +
      "with every checkpoint carrying a files sidecar") {
    // the large-table format races differently: sidecar link before
    // manifest link (two put-if-absents), truncation deleting the pair,
    // replay reading manifest+sidecar while a foreign truncator runs
    val saved = TxLog.filesSidecarThreshold
    TxLog.filesSidecarThreshold = 1
    try withDir(ckptTruncFuzz)
    finally TxLog.filesSidecarThreshold = saved
  }

  private def ckptTruncFuzz(dir: String): Unit = {
    locally {
      val e = new TsdbEngine(spark, s"$dir/db")
      e.checkpointInterval = 5
      e.inlineCompactThreshold = 8
      e.l0CompactThreshold = 2
      e.foldVacuumGraceMs = 3600000L // readers protected; ledger holds
      val n = 160
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      def guard(name: String)(f: => Unit): Thread = {
        val t = new Thread(() =>
          try f catch { case ex: Throwable =>
            errs.add(new RuntimeException(name, ex)); stop.set(true) })
        t.setDaemon(true); t.start(); t
      }
      val follower = new TsdbEngine(spark, s"$dir/db")
      val ingester = guard("ingest") {
        (0 until n).foreach { i =>
          assert(e.putBatch(Seq(pt("m", s"h${i % 7}", i * 1000L,
            i.toDouble))).isRight)
        }
        stop.set(true)
      }
      val foreign = new TxLog(s"$dir/db/_log")
      val truncator = guard("foreign-ckpt-trunc") {
        while (!stop.get()) {
          val s = foreign.replay()
          if (s.version > 0) foreign.writeCheckpoint(s)
          foreign.truncate(graceMs = 0L, keepCheckpoints = 2)
        }
      }
      val syncer = guard("follower-sync") {
        while (!stop.get()) { follower.sync(); Thread.sleep(1) }
      }
      val traveler = guard("time-travel") {
        val rnd = new scala.util.Random(15L)
        while (!stop.get()) {
          val v = e.version
          if (v > 0)
            try e.readAt(math.max(1L, v - rnd.nextInt(10))).count()
            catch { case _: IllegalStateException => () } // truncated past: clean
          Thread.sleep(2)
        }
      }
      Seq(ingester, truncator, syncer, traveler).foreach(_.join(300000))
      assert(errs.isEmpty, {
        val sw = new java.io.StringWriter()
        errs.forEach(_.printStackTrace(new java.io.PrintWriter(sw)))
        s"fuzz threads failed:\n$sw"
      })
      assert(count(e, "m") == n, "every acked row must be durable")
      assert(follower.sync() == e.version)
      assert(count(follower, "m") == n,
        "the follower must converge across checkpoint/truncation churn")
    }
  }

  test("replay survives a truncation landing MID-WALK: the retry forces " +
      "the jump to a covering checkpoint; uncovered gaps still fail clean") {
    withDir { dir =>
      // the ProbeCkptFuzz capture: the jump probe saw commit start+1
      // present, a concurrent grace-0 truncator then deleted commits in
      // (start, tip] before replayTail read them → "commit manifest 3
      // is gone" killed a follower sync. A manifest only disappears
      // when a checkpoint materializes its state, so the walk must
      // re-resolve the jump and retry, not die.
      val t = new TxLog(s"$dir/log")
      (1 to 10).foreach { i =>
        t.commit(v => LogCommit(v,
          adds = Seq(f"metric=m/date=1970-01-01/c$v%03d.parquet"),
          metrics = Seq("m"), maxSeq = i.toLong))
      }
      val base = t.replay(upTo = 2L)
      val full = t.replay()
      t.writeCheckpoint(t.replay(upTo = 8L))
      // the race as a directory state: the jump probe sees commit 3
      // present, but 4..8 vanish before the walk reads them
      (4 to 8).foreach(v => Files.delete(t.commitPath(v)))
      assert(new TxLog(s"$dir/log").replay(base) == full,
        "a mid-walk truncation hole must recover via the checkpoint jump")
      // below the retained window there is no covering checkpoint —
      // the documented clean failure is preserved, not an endless retry
      intercept[IllegalStateException](
        new TxLog(s"$dir/log").replay(upTo = 5L))
    }
  }

  test("TxLog: checkpoint round-trips the snapshot bit-for-bit; " +
      "latestVersion needs no listing once tipped") {
    withDir { dir =>
      val t = new TxLog(s"$dir/log")
      val blob = InlineRows.encode(Seq((pt("m", "a", 1L, 1.0), 5L)))
      t.commit(v => LogCommit(v, adds = Seq("metric=m/date=d/a.parquet",
        "l0/x.parquet"), metrics = Seq("m"), dates = Seq("1970-01-01"),
        maxSeq = 9L))
      t.commit(v => LogCommit(v, inline = Some(blob), metrics = Seq("m"),
        dates = Seq("1970-01-01"), txnApp = Some("app"), txnBatch = Some(3L),
        maxSeq = 11L))
      t.commit(v => LogCommit(v, tombs = Seq(TsdbEngine.TombRow("point", "m",
        Map("host" -> "a"), 1L, 1L, 12L)), metrics = Seq("m"), maxSeq = 12L))
      val s = t.replay()
      t.writeCheckpoint(s)
      assert(t.readCheckpoint(3L) == s,
        "checkpoint must round-trip files/tombs/epochs/txns/l0Keys/inline")
      // replay from a COLD TxLog instance with commits 1..3 deleted:
      // only the checkpoint carries the state now
      t.truncate(graceMs = 0L, keepCheckpoints = 1)
      // truncate keeps commits ABOVE the kept checkpoint only; all three
      // are ≤ it here
      val t2 = new TxLog(s"$dir/log")
      assert(t2.availableCommitVersions().isEmpty)
      assert(t2.latestVersion() == 3L,
        "latestVersion must see the checkpointed tip with zero commits")
      assert(t2.replay() == s, "cold replay must start from the checkpoint")
    }
  }

  test("large-table checkpoints split the files list to a SIDECAR: " +
      "round-trip, cold replay, truncation cleanup") {
    withDir { dir =>
      // at ~800k live files (100 TB / 128 MB) the inline JSON files list
      // is ~40 MB serialized on the committing thread every interval —
      // above the threshold the list moves to a newline sidecar
      // (ProbeCkptCost: 1M-file write 203→~35 ms, read 513→~160 ms)
      val saved = TxLog.filesSidecarThreshold
      TxLog.filesSidecarThreshold = 10
      try {
        val t = new TxLog(s"$dir/log")
        val paths = (0 until 50).map(i =>
          f"metric=m${i % 3}/date=2024-01-${i % 9 + 1}%02d/c-$i%04d.parquet")
        t.commit(v => LogCommit(v, adds = paths,
          metrics = Seq("m0", "m1", "m2"), dates = Seq("2024-01-01"),
          maxSeq = 1L))
        t.commit(v => LogCommit(v, tombs = Seq(TsdbEngine.TombRow("series",
          "m0", Map("h" -> "a"), 0L, 0L, 2L)), metrics = Seq("m0"), maxSeq = 2L))
        val s = t.replay()
        t.writeCheckpoint(s)
        assert(Files.exists(t.checkpointFilesPath(2L)),
          "50 files ≥ threshold 10 must produce a sidecar")
        assert(Files.size(t.checkpointPath(2L)) < 1000,
          "the JSON manifest must not inline the file list")
        assert(t.readCheckpoint(2L) == s,
          "sidecar checkpoint must round-trip the snapshot exactly")
        // cold replay across truncation sees only the sidecar checkpoint
        t.truncate(graceMs = 0L, keepCheckpoints = 1)
        val t2 = new TxLog(s"$dir/log")
        assert(t2.replay() == s)
        // a SMALL list stays inline (both formats readable side by side)
        t.commit(v => LogCommit(v, removes = paths.drop(1),
          metrics = Seq("m0", "m1", "m2"), maxSeq = 3L))
        TxLog.filesSidecarThreshold = 1000
        t.writeCheckpoint(t.replay())
        assert(!Files.exists(t.checkpointFilesPath(3L)))
        assert(t.readCheckpoint(3L) == t.replay())
        // truncation collects the old sidecar WITH its manifest
        t.truncate(graceMs = 0L, keepCheckpoints = 1)
        assert(!Files.exists(t.checkpointPath(2L)))
        assert(!Files.exists(t.checkpointFilesPath(2L)),
          "a truncated checkpoint must not orphan its sidecar")
      } finally TxLog.filesSidecarThreshold = saved
    }
  }

  test("replicateTo ships the sidecar BEFORE the checkpoint manifest; " +
      "the follower replays a sidecar checkpoint") {
    withDir { dir =>
      val saved = TxLog.filesSidecarThreshold
      TxLog.filesSidecarThreshold = 1 // any non-empty table crosses it
      try {
        val e1 = tuned(new TsdbEngine(spark, s"$dir/db"))
        (0 until 30).foreach(i =>
          assert(e1.putBatch(Seq(pt("m", s"h$i", i * 1000L, i.toDouble))).isRight))
        assert(e1.compact().isRight)
        (30 until 40).foreach(i =>
          assert(e1.putBatch(Seq(pt("m", s"h$i", i * 1000L, i.toDouble))).isRight))
        val log = new TxLog(s"$dir/db/_log")
        val cv = log.latestCheckpoint().get
        assert(Files.exists(log.checkpointFilesPath(cv)),
          "test setup: the shipped checkpoint must use the sidecar format")
        val shipped = e1.replicateTo(s"$dir/follower")
        assert(shipped == e1.version)
        val fl = new TxLog(s"$dir/follower/_log")
        assert(Files.exists(fl.checkpointFilesPath(cv)),
          "the sidecar must ship with its manifest")
        val f = new TsdbEngine(spark, s"$dir/follower")
        assert(f.version == e1.version)
        assert(count(f, "m") == 40)
      } finally TxLog.filesSidecarThreshold = saved
    }
  }
}
