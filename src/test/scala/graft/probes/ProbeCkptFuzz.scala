package graft

import graft.model.{DataPoint, FieldValue}
import graft.tsdb._
import org.apache.spark.sql.SparkSession

/** Round-16 stress driver for the checkpoint/truncation fuzz under the
  * SIDECAR format: the ScalaTest fuzz failed once in 12 full-suite runs
  * with the ingest thread's stack lost to output truncation — this
  * probe loops the same scenario in one JVM and prints the FULL stack
  * of the first failure (the r14 flake-watch lesson: name the failure
  * immediately, never re-derive it from a summary line). */
object ProbeCkptFuzz {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val saved = TxLog.filesSidecarThreshold
    TxLog.filesSidecarThreshold = 1
    try {
      (0 until iters).foreach { it =>
        val dir = java.nio.file.Files.createTempDirectory("graft_ckfz").toString
        try runOnce(spark, dir, it)
        finally org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dir))
      }
      println(s"[probe] $iters iterations clean")
    } finally TxLog.filesSidecarThreshold = saved
    spark.stop()
  }

  private def pt(m: String, host: String, ts: Long, v: Double) =
    DataPoint(m, Map("host" -> host), ts, Map("value" -> FieldValue.ofDouble(v)))

  private def runOnce(spark: SparkSession, dir: String, it: Int): Unit = {
    val e = new TsdbEngine(spark, s"$dir/db")
    e.checkpointInterval = 5
    e.inlineCompactThreshold = 8
    e.l0CompactThreshold = 2
    e.foldVacuumGraceMs = 3600000L
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
        val r = e.putBatch(Seq(pt("m", s"h${i % 7}", i * 1000L, i.toDouble)))
        require(r.isRight, s"putBatch returned $r")
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
      val rnd = new scala.util.Random(15L + it)
      while (!stop.get()) {
        val v = e.version
        if (v > 0)
          try e.readAt(math.max(1L, v - rnd.nextInt(10))).count()
          catch { case _: IllegalStateException => () }
        Thread.sleep(2)
      }
    }
    Seq(ingester, truncator, syncer, traveler).foreach(_.join(300000))
    if (!errs.isEmpty) {
      println(s"[probe] FAILED at iteration $it:")
      errs.forEach(_.printStackTrace(System.out))
      sys.exit(1)
    }
    val got = e.query(QueryParams("m", startNs = 0L,
      endNs = Some(1L << 40))).count()
    require(got == n, s"lost rows: $got != $n")
    require(follower.sync() == e.version, "follower diverged")
    if (it % 5 == 0) println(s"[probe] iteration $it clean")
  }
}
