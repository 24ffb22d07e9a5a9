package graft

import graft.model.{DataPoint, FieldValue}
import graft.tsdb._
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.collection.JavaConverters._

/** LEVEL-0 storage semantics (round 13): streaming (txn) micro-batch
  * commits land as unpartitioned L0 parquet — metric/date as COLUMNS,
  * shuffle-free, one file per source partition — and [[TsdbEngine
  * .compactL0]] migrates level 0 into the hive layout. The LSM
  * memtable-flush / L0-table shape (cf. the reference's level manifest,
  * `engine2/levels_manifest.go`), adopted because the hive-clustered
  * write was 60-90% of streaming ingest wall-clock (SCALE.md r13: a
  * micro-batch spread over ~150 (metric, date) directories paid ~150
  * parquet writers per batch).
  *
  * Contract pinned here: rows are INDISTINGUISHABLE across levels —
  * every read surface (query merge, tombstones, SHOW, analytics,
  * rollups, subscriptions, time travel) returns identical content
  * whether a row lives in level 0, the hive layout, or moved between
  * them mid-test. */
class L0Spec extends SparkSpec {

  private def withDir(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft_l0").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  private def txnBatch(e: TsdbEngine, m: String, host: String, ts: Long,
      v: Double) = {
    import SparkTestSession.spark.implicits._
    Seq(TsdbEngine.StoredPoint(m, Map("host" -> host), ts,
      Map("value" -> TsdbEngine.StoredValue(Some(v), None, None, None)),
      e.nextSeq())).toDF()
  }

  private def l0Files(dir: String): Seq[String] = {
    val p = Paths.get(s"$dir/db/data/l0")
    if (!Files.isDirectory(p)) Nil
    else Files.list(p).iterator().asScala.map(_.toString)
      .filter(_.endsWith(".parquet")).toSeq
  }

  private def hiveDirs(dir: String): Seq[String] = {
    val p = Paths.get(s"$dir/db/data")
    if (!Files.isDirectory(p)) Nil
    else Files.list(p).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("metric=")).toSeq
  }

  test("commit routing: txn batches land in level 0, small driver batches " +
      "inline in the log, big driver batches hive-clustered") {
    withDir { dir =>
      val e = new TsdbEngine(spark, s"$dir/db")
      e.putDF(txnBatch(e, "l0.m", "h1", 1000L, 1.0), txn = Some(("app", 0L)))
      assert(l0Files(dir).size == 1, "a txn micro-batch must write level 0")
      assert(!hiveDirs(dir).exists(_.contains("l0.m")),
        "no hive directory until compaction")
      // small driver batch: INLINE in the commit manifest — no file at all
      assert(e.putBatch(Seq(DataPoint("inline.m", Map("host" -> "h1"), 1000L,
        Map("value" -> FieldValue.ofDouble(3.0))))).isRight)
      assert(e.inlineCommitCount == 1, "a small putBatch must commit inline")
      assert(!hiveDirs(dir).exists(_.contains("inline.m")))
      // past the inline row budget: the staged clustered write
      e.inlineMaxRows = 0
      assert(e.putBatch(Seq(DataPoint("bulk.m", Map("host" -> "h1"), 1000L,
        Map("value" -> FieldValue.ofDouble(2.0))))).isRight)
      assert(hiveDirs(dir).exists(_.contains("bulk.m")),
        "an over-budget putBatch keeps the clustered layout")
      // all three levels serve: full content through every basic surface
      assert(e.query(QueryParams("l0.m", startNs = 0L,
        endNs = Some(1L << 60))).count() == 1)
      assert(e.query(QueryParams("inline.m", startNs = 0L,
        endNs = Some(1L << 60))).count() == 1)
      assert(e.showMetrics().collect().map(_.getString(0)).toSeq ==
        Seq("bulk.m", "inline.m", "l0.m"))
      // the LSM ladder: compactInline flushes the manifest rows to
      // LEVEL 0; compactL0 clusters them into the hive layout
      val l0Before = l0Files(dir).size
      e.compactInline()
      assert(e.inlineCommitCount == 0)
      assert(l0Files(dir).size == l0Before + 1,
        "compactInline must flush the inline rows as one level-0 file")
      assert(e.query(QueryParams("inline.m", startNs = 0L,
        endNs = Some(1L << 60))).count() == 1)
      e.compactL0()
      assert(hiveDirs(dir).exists(_.contains("inline.m")),
        "compactL0 must cluster the flushed rows into the hive layout")
      assert(e.query(QueryParams("inline.m", startNs = 0L,
        endNs = Some(1L << 60))).count() == 1)
    }
  }

  test("rows are level-invisible: merge, tombstones, latest-version-wins across levels") {
    withDir { dir =>
      val e = new TsdbEngine(spark, s"$dir/db")
      // hive row first, then a NEWER version of the same (series, ts) via L0
      assert(e.putBatch(Seq(DataPoint("m", Map("host" -> "h1"), 1000L,
        Map("value" -> FieldValue.ofDouble(1.0))))).isRight)
      e.putDF(txnBatch(e, "m", "h1", 1000L, 9.0), txn = Some(("app", 0L)))
      val q = QueryParams("m", startNs = 0L, endNs = Some(1L << 60))
      val rows = e.query(q).collect()
      assert(rows.length == 1, "latest-version merge must span levels")
      assert(rows.head.getAs[Map[String, org.apache.spark.sql.Row]]("fields")
        .get("value").exists(_.getAs[Double]("d") == 9.0),
        "the L0 version (higher seq) must win")
      // a tombstone shadows the L0 row like any other
      assert(e.deletePoint("m", Map("host" -> "h1"), 1000L).isRight)
      assert(e.query(q).count() == 0)
    }
  }

  test("compactL0 migrates level 0 into hive layout, content bit-identical") {
    withDir { dir =>
      val e = new TsdbEngine(spark, s"$dir/db")
      val day = 86400000000000L
      (0 until 3).foreach { i =>
        e.putDF(txnBatch(e, "m", s"h$i", i * day + 1000L, i.toDouble),
          txn = Some(("app", i.toLong)))
      }
      assert(l0Files(dir).size == 3)
      val q = QueryParams("m", startNs = 0L, endNs = Some(1L << 60))
      val before = e.query(q).collect().map(_.toSeq).toSeq
      val vBefore = e.version
      e.compactL0()
      assert(l0Files(dir).isEmpty, "compactL0 must drain level 0")
      val dataDates = Files.list(Paths.get(s"$dir/db/data/metric=m"))
        .iterator().asScala.map(_.getFileName.toString).toSeq.sorted
      assert(dataDates == Seq("date=1970-01-01", "date=1970-01-02", "date=1970-01-03"),
        s"migrated rows must land in their date partitions, got $dataDates")
      assert(e.version == vBefore + 1, "one atomic adds+removes commit")
      val after = e.query(q).collect().map(_.toSeq).toSeq
      assert(after == before, "layout migration must not change content")
      val e2 = new TsdbEngine(spark, s"$dir/db")
      assert(e2.query(q).collect().map(_.toSeq).toSeq == before,
        "a fresh engine (log replay incl. L0 metadata) reads the same rows")
    }
  }

  test("l0CompactThreshold folds level 0 inline once exceeded") {
    withDir { dir =>
      val e = new TsdbEngine(spark, s"$dir/db")
      e.l0CompactThreshold = 2
      (0 until 4).foreach { i =>
        e.putDF(txnBatch(e, "m", "h1", i * 1000L + 1000L, i.toDouble),
          txn = Some(("app", i.toLong)))
      }
      // 3rd commit exceeded the threshold -> inline migration; the 4th
      // landed in the fresh level 0
      assert(l0Files(dir).size == 1,
        s"expected 1 post-migration L0 file, got ${l0Files(dir).size}")
      assert(hiveDirs(dir).exists(_.contains("m")))
      assert(e.query(QueryParams("m", startNs = 0L,
        endNs = Some(1L << 60))).count() == 4)
    }
  }

  test("rollup maintenance (incl. smoothing) stays exact across L0 commits and migration") {
    withDir { dir =>
      val e = new TsdbEngine(spark, s"$dir/db")
      val Min = 60L * 1000 * 1000 * 1000
      val pts = (0 until 60).map(i => DataPoint("reqs", Map("host" -> s"h${i % 2}"),
        i * Min, Map("value" -> FieldValue.ofDouble((i * 7 % 13).toDouble))))
      assert(e.putBatch(pts).isRight)
      e.registerRollup("reqs", 5 * Min, Seq("value"),
        smooth = Seq(SmoothSpec("value", "ewma", 0.25)))
      val q = QueryParams("reqs", startNs = 0L, endNs = Some(8 * 60 * Min - 1))
      val spec = AnalyzeEwmaBy("value", 0.25, 10 * Min)
      e.analyze(q, spec).collect() // materialize
      // two L0 commits extend the series
      (0 until 2).foreach { i =>
        e.putDF(txnBatch(e, "reqs", "h0", (60 + i) * Min, 5.0 + i),
          txn = Some(("app", i.toLong)))
      }
      val raw = TsAnalytics.ewmaSmoothBy(e.loadPoints().get, q, 0.25, 10 * Min)
        .collect().map(_.toSeq).toSeq
      val routed = e.analyze(q, spec).collect().map(_.toSeq).toSeq
      assert(e.lastServePath == "rollup-ewma", e.lastServePath)
      assert(routed == raw,
        "rollup fold over L0 commits must be bit-identical to the raw fold")
      e.compactL0()
      val routed2 = e.analyze(q, spec).collect().map(_.toSeq).toSeq
      assert(routed2 == raw, "migration must not disturb the routed fold")
    }
  }

  test("random commit-kind interleavings: query == model across levels, " +
      "compactions and restarts") {
    // Storage-level fuzz: hive puts, L0 (txn) puts, point/series deletes,
    // both compaction kinds and engine RESTARTS (log replay incl. the L0
    // key metadata) interleave randomly; after every op the engine's
    // merged read must equal an op-order model (engine seqs are
    // monotonic in call order, so "latest op wins" IS the seq merge).
    val rnd = new scala.util.Random(20260816L)
    val hosts = Seq("a", "b", "c")
    (0 until 3).foreach { round =>
      withDir { dir =>
        def tune(e: TsdbEngine): TsdbEngine = {
          e.l0CompactThreshold = 2
          // size-1 driver batches commit INLINE, bigger ones stage hive —
          // the fuzz then interleaves all three commit kinds
          e.inlineMaxRows = 1
          e.inlineCompactThreshold = 2
          e
        }
        var e = tune(new TsdbEngine(spark, s"$dir/db"))
        // model rows/tombs carry a per-point VERSION mirroring the
        // engine's seq order (each written point / tombstone draws the
        // next version, exactly like nextSeq in call order)
        var ver = 0
        def nextVer(): Int = { ver += 1; ver }
        var rows = Vector.empty[(String, Long, Double, Int)] // host, ts, v, ver
        var ptombs = Vector.empty[(String, Long, Int)]
        var stombs = Vector.empty[(String, Int)]
        var batchId = 0L
        def modelVisible: Set[(String, Long, Double)] = {
          val latest = rows.groupBy(r => (r._1, r._2))
            .map { case (_, vs) => vs.maxBy(_._4) }
          latest.filterNot { case (h, ts, _, v) =>
            ptombs.exists(t => t._1 == h && t._2 == ts && v <= t._3) ||
              stombs.exists(t => t._1 == h && v <= t._2)
          }.map(r => (r._1, r._2, r._3)).toSet
        }
        (0 until 14).foreach { op =>
          rnd.nextInt(8) match {
            case 0 | 1 => // hive putBatch
              val pts = (0 until 1 + rnd.nextInt(3)).map { _ =>
                val (h, ts, v) = (hosts(rnd.nextInt(3)),
                  rnd.nextInt(12).toLong, rnd.nextInt(50).toDouble)
                rows :+= ((h, ts, v, nextVer()))
                DataPoint("m", Map("host" -> h), ts,
                  Map("value" -> FieldValue.ofDouble(v)))
              }
              assert(e.putBatch(pts).isRight)
            case 2 | 3 => // L0 txn put
              import SparkTestSession.spark.implicits._
              val sp = (0 until 1 + rnd.nextInt(3)).map { _ =>
                val (h, ts, v) = (hosts(rnd.nextInt(3)),
                  rnd.nextInt(12).toLong, rnd.nextInt(50).toDouble)
                rows :+= ((h, ts, v, nextVer()))
                TsdbEngine.StoredPoint("m", Map("host" -> h), ts,
                  Map("value" -> TsdbEngine.StoredValue(Some(v), None, None, None)),
                  e.nextSeq())
              }
              e.putDF(sp.toDF(), txn = Some(("fuzz", batchId)))
              batchId += 1
            case 4 => // point delete
              val (h, ts) = (hosts(rnd.nextInt(3)), rnd.nextInt(12).toLong)
              ptombs :+= ((h, ts, nextVer()))
              assert(e.deletePoint("m", Map("host" -> h), ts).isRight)
            case 5 => // series delete
              val h = hosts(rnd.nextInt(3))
              stombs :+= ((h, nextVer()))
              assert(e.deleteSeries("m", Map("host" -> h)).isRight)
            case 6 => // a compaction kind
              rnd.nextInt(3) match {
                case 0 => e.compactL0()
                case 1 => e.compactInline()
                case _ =>
                  assert(e.compact().isRight)
                  // compact folds tombstones into the data; model keeps
                  // them (shadowing is monotone, so keeping is equivalent)
              }
            case 7 => // restart: replay the log, L0 + inline metadata incl.
              e = tune(new TsdbEngine(spark, s"$dir/db"))
          }
          val got = e.query(QueryParams("m", startNs = 0L,
              endNs = Some(1L << 40))).collect().map { r =>
            (r.getAs[Map[String, String]]("tags")("host"),
              r.getAs[Long]("timestamp"),
              r.getAs[Map[String, org.apache.spark.sql.Row]]("fields")("value")
                .getAs[Double]("d"))
          }.toSet
          assert(got == modelVisible,
            s"round $round op $op: engine/model diverged\n got=$got\n exp=$modelVisible")
        }
      }
    }
  }

  test("concurrent wire-shaped writers: no row lost across inline folds") {
    // 10 threads commit unique single-point batches while the tiny
    // thresholds force inline→L0 folds (and L0→hive) to race the
    // writers. The fold records the EXACT versions it folded
    // (LogCommit.foldedInline) — a blunt clear would wipe a commit that
    // landed between the folder's snapshot and its commit, silently
    // losing rows. Every written key must survive.
    withDir { dir =>
      val e = new TsdbEngine(spark, s"$dir/db")
      e.inlineCompactThreshold = 3
      e.l0CompactThreshold = 2
      val (threads, perT) = (10, 12)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = (0 until threads).map { tid =>
        val t = new Thread(() => try {
          (0 until perT).foreach { i =>
            e.putBatch(Seq(DataPoint("m", Map("host" -> s"h$tid"),
              i.toLong * 1000L,
              Map("value" -> FieldValue.ofDouble(tid * 1000.0 + i)))))
              .fold(sys.error, identity)
          }
        } catch { case x: Throwable => errs.add(x); () })
        t.start(); t
      }
      ts.foreach(_.join())
      assert(errs.isEmpty, s"writer failed: ${Option(errs.peek())}")
      val got = e.query(QueryParams("m", startNs = 0L,
        endNs = Some(1L << 40))).collect()
        .map(r => (r.getAs[Map[String, String]]("tags")("host"),
          r.getAs[Long]("timestamp"))).toSet
      val want = (for (tid <- 0 until threads; i <- 0 until perT)
        yield (s"h$tid", i.toLong * 1000L)).toSet
      assert(got == want,
        s"lost ${(want -- got).size} rows, phantom ${(got -- want).size}")
      // restart: the fold/clear history replays to the same content
      val e2 = new TsdbEngine(spark, s"$dir/db")
      assert(e2.query(QueryParams("m", startNs = 0L,
        endNs = Some(1L << 40))).count() == want.size)
    }
  }

  test("subscription commit reads and time travel see L0 commits") {
    withDir { dir =>
      val e = new TsdbEngine(spark, s"$dir/db")
      val v0 = e.version
      e.putDF(txnBatch(e, "m", "h1", 1000L, 1.0), txn = Some(("app", 0L)))
      val v1 = e.version
      assert(v1 == v0 + 1)
      val (puts, tombs) = e.commitChanges(v1)
      assert(tombs.isEmpty)
      val rows = puts.get.collect()
      assert(rows.length == 1 &&
        rows.head.getAs[String]("metric") == "m" &&
        rows.head.getAs[Long]("timestamp") == 1000L,
        "the subscription path must read an L0 commit's rows")
      e.putDF(txnBatch(e, "m", "h1", 2000L, 2.0), txn = Some(("app", 1L)))
      assert(e.readAt(v1).count() == 1, "time travel across L0 versions")
      assert(e.loadPoints().get.count() == 2)
    }
  }
}
