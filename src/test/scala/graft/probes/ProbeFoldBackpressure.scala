package graft

import org.apache.spark.sql.SparkSession

/** Round-14 probe (VERDICT r13 agenda #7): drive wire-shaped inline
  * ingest at maximum rate for minutes and chart the fold ladder's
  * steady state. First run PROVED the drift the verdict suspected:
  * `foldOnce` skips folds while one is in flight, so 10 sustained
  * writers outran the fold — inline commits hit 1600+ (25× threshold),
  * checkpoints serialized ~50 MB of live blobs, and ingest collapsed
  * 98k → 25k rows/s (plus a truncate() TOCTOU crash). Both fixed:
  * write-stall backpressure ([[graft.tsdb.TsdbEngine
  * .inlineStallThreshold]]/[[graft.tsdb.TsdbEngine.l0StallThreshold]] —
  * the LSM L0-stall analog) and single-flighted checkpoints. Post-fix:
  * 10.09M rows / 3 min sustained at ~56k rows/s, 100% verified stored,
  * inline bounded at the stall ceiling, L0 at threshold+1, log dir
  * bounded by the grace window (SCALE.md r14). */
object ProbeFoldBackpressure {
  def main(args: Array[String]): Unit = {
    val minutes = args.headOption.map(_.toDouble).getOrElse(3.0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft_backp").toString
    val e = new graft.tsdb.TsdbEngine(spark, s"$tmp/db")
    // default grace is 10 min — longer than the probe; 30 s lets the
    // run SHOW fold vacuum + log truncation reaching steady state too
    e.foldVacuumGraceMs = 30000L
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    def pt(tid: Int, i: Long) = graft.model.DataPoint("bp.m",
      Map("host" -> s"h$tid"), i,
      Map("v" -> graft.model.FieldValue.ofDouble(i.toDouble)))
    val writers = (0 until 10).map { tid =>
      val t = new Thread(() => {
        var i = 0L
        while (!stop.get()) {
          val batch = (0 until 500).map(j => pt(tid, i * 500 + j))
          e.putBatch(batch).fold(sys.error, identity)
          rows.addAndGet(500L)
          i += 1
        }
      })
      t.setDaemon(true); t.start(); t
    }
    val t0 = System.nanoTime()
    val samples = scala.collection.mutable.ArrayBuffer[(Double, Long, Int, Int, Int)]()
    while ((System.nanoTime() - t0) / 1e9 < minutes * 60) {
      Thread.sleep(5000)
      val (files, l0) = e.fileCounts
      val sec = (System.nanoTime() - t0) / 1e9
      samples += ((sec, rows.get(), e.inlineCommitCount, l0, files))
      println(f"t=${sec}%5.0f s rows=${rows.get()}%,12d " +
        f"rate=${rows.get() / sec}%,9.0f r/s inline=${e.inlineCommitCount}%3d " +
        f"l0=$l0%3d files=$files%4d logdir=${logCount(tmp)}%4d")
    }
    stop.set(true); writers.foreach(_.join(30000))
    val inlineMax = samples.map(_._3).max
    val l0Max = samples.map(_._4).max
    val tail = samples.takeRight(math.max(1, samples.size / 3))
    println(f"TOTAL rows=${rows.get()}%,d sustained=${rows.get() / ((System.nanoTime() - t0) / 1e9)}%,.0f rows/s")
    println(s"inline_commits max=$inlineMax (threshold ${e.inlineCompactThreshold}) " +
      s"tail-mean=${tail.map(_._3).sum / tail.size}")
    println(s"l0_files max=$l0Max (threshold ${e.l0CompactThreshold}) " +
      s"tail-mean=${tail.map(_._4).sum / tail.size}")
    println(s"log dir files at end: ${logCount(tmp)} (checkpoint truncation bounds it)")
    val verified = e.query(graft.tsdb.QueryParams("bp.m", startNs = 0L,
      endNs = Some(Long.MaxValue / 2))).count()
    println(s"verified stored: $verified / ${rows.get()}")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  private def logCount(tmp: String): Long = {
    val p = java.nio.file.Paths.get(s"$tmp/db/_log")
    if (!java.nio.file.Files.isDirectory(p)) 0L
    else { val s = java.nio.file.Files.list(p); try s.count() finally s.close() }
  }
}
