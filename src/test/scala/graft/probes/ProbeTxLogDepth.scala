package graft

import graft.tsdb._
import java.nio.file.{Files, Paths}

/** Round-14 probe: commit latency vs log DEPTH. r13's write path lands
  * 100-200 commits/s on the TxLog; pre-checkpoint, every commit listed
  * the whole log directory (`latestVersion`) and restart replay walked
  * every manifest ever written — O(total commits) each, quadratic
  * cumulative. This drives the engine's exact commit cadence (inline
  * commit + incremental replay per commit; a fold commit + checkpoint +
  * truncate every 64, like `TsdbEngine.committed`) across a deep
  * history and reports per-1k-batch mean latency: FLAT is the done
  * criterion, with the directory bounded at O(interval + kept
  * checkpoints). */
object ProbeTxLogDepth {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val dir = Files.createTempDirectory("graft_txlogdepth").toString
    val t = new TxLog(s"$dir/log")
    var snap = LogSnapshot.empty
    val times = scala.collection.mutable.ArrayBuffer[Double]()
    val batch = 1000
    var i = 0
    var folds = 0
    while (i < n) {
      val t0 = System.nanoTime()
      var j = 0
      while (j < batch) {
        t.commit(v => LogCommit(v, inline = Some("QUJD"),
          metrics = Seq("m"), dates = Seq("1970-01-01"), maxSeq = i.toLong))
        snap = t.replay(snap) // the engine's per-commit refresh
        if (snap.inline.size > 64) { // the engine's inline fold cadence
          val s = snap
          t.commit(v => LogCommit(v, adds = Seq(s"l0/f$v.parquet"),
            foldedInline = s.inline.map(_.version), metrics = Seq("m"),
            dates = Seq("1970-01-01"), maxSeq = i.toLong))
          snap = t.replay(snap)
          folds += 1
        }
        if (t.commitsSinceCheckpoint(snap.version) >= 64) {
          t.writeCheckpoint(snap)
          t.truncate(0L)
        }
        j += 1; i += 1
      }
      times += (System.nanoTime() - t0) / 1e6 / batch // ms per commit
    }
    val deciles = times.grouped(math.max(1, times.size / 10))
      .map(g => f"${g.sum / g.size}%.3f").mkString(", ")
    val first5 = times.take(5).sum / 5
    val last5 = times.takeRight(5).sum / 5
    val dirCount = { val s = Files.list(Paths.get(s"$dir/log"))
      try s.count() finally s.close() }
    println(s"commits=$n folds=$folds")
    println(s"ms/commit per decile: $deciles")
    println(f"first5=${first5}%.3f ms last5=${last5}%.3f ms " +
      f"ratio=${last5 / first5}%.2f (flat ~= 1.0)")
    println(s"log dir file count at end: $dirCount (bounded, was O(n))")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
