package graft

import graft.model.{DataPoint, FieldValue}
import graft.tsdb._
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-15 probe (VERDICT r14 #1 "done" gate): write-path fold cost
  * must be FLAT in table size. r14's folds paid a `Files.walk` of the
  * entire data root per fold (vacuum); at 100× scale that walk is
  * millions of file stats fired continuously under sustained ingest.
  * The fix vacuums from the fold's own dereference ledger.
  *
  * Protocol: seed N synthetic live data files into the manifest (zero-
  * byte, never read — folds read only level 0; committed through a
  * second TxLog on the same root, the shared-storage model), then
  * drive a fixed putBatch count through threshold folds and measure
  * the ingest+fold wall. For contrast, one explicit admin `vacuum(0)`
  * — the retained full-walk path — is timed at each N.
  *
  * Done = ingest+fold wall flat 1k → 100k while the admin walk grows
  * with N. */
object ProbeFoldCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = Files.createTempDirectory("graft_foldcost").toString
    val batches = 120
    def dp(i: Int) = DataPoint("m", Map("host" -> s"h${i % 50}"),
      i.toLong * 1000000000L, Map("value" -> FieldValue.ofDouble(i.toDouble)))
    // JIT/codegen warmup on a throwaway engine, excluded — a FULL
    // batch count: the first probe run's 30-batch warmup left the 1k
    // row carrying ~24 s of residual JIT (59.9 vs 36.2/36.3 s at
    // 10k/100k on the same code)
    locally {
      val w = new TsdbEngine(spark, s"$tmp/warm")
      w.inlineCompactThreshold = 2; w.l0CompactThreshold = 1
      w.foldVacuumGraceMs = 0L
      (0 until batches).foreach(i => w.putBatch(Seq(dp(i))))
      w.close()
    }
    Seq(1000, 10000, 100000).foreach { n =>
      val root = s"$tmp/db$n"
      val e = new TsdbEngine(spark, root)
      e.inlineCompactThreshold = 2
      e.l0CompactThreshold = 1
      e.foldVacuumGraceMs = 0L
      e.checkpointInterval = 0 // checkpoint cost probed separately (ProbeCkptCost)
      // seed N synthetic live files (metric "synth" — never queried)
      val dataDir = Paths.get(s"$root/data")
      val t0 = System.nanoTime()
      val paths = (0 until n).map(i =>
        f"metric=synth/date=1970-01-01/seed-$i%06d.parquet")
      Files.createDirectories(dataDir.resolve("metric=synth/date=1970-01-01"))
      paths.foreach(p => Files.createFile(dataDir.resolve(p)))
      new TxLog(s"$root/_log").commit(v =>
        LogCommit(v, adds = paths, metrics = Seq("synth"),
          dates = Seq("1970-01-01")))
      e.sync()
      println(f"[probe] n=$n%6d seeded in ${(System.nanoTime() - t0) / 1e9}%.1f s" +
        s" (live=${e.fileCounts._1})")
      val t1 = System.nanoTime()
      (0 until batches).foreach(i => e.putBatch(Seq(dp(i))))
      val ingestS = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      e.vacuum(0L) // the ADMIN full-walk path, for contrast
      val walkS = (System.nanoTime() - t2) / 1e9
      println(f"[probe] n=$n%6d: $batches putBatches (threshold folds riding " +
        f"them) = $ingestS%.2f s (${ingestS * 1000 / batches}%.1f ms/batch); " +
        f"admin full-walk vacuum = $walkS%.3f s")
      e.close()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
