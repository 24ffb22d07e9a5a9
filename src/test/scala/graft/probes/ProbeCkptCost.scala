package graft

import graft.tsdb._
import java.nio.file.{Files, Paths}

/** Round-15 probe (VERDICT r14 #5): bound the checkpoint manifest cost
  * before it surprises anyone. `writeCheckpoint` serializes the FULL
  * snapshot JSON on the committing writer's thread every
  * `checkpointInterval` commits; at 100× the `files` list itself (not
  * inline blobs) dominates. Measures write/read wall-time and on-disk
  * size at 1k/10k/100k live files — if the growth is linear with a
  * small constant (JSON of ~60 B/path), the format holds; a
  * superlinear curve or multi-second writes at 100k would demand the
  * Delta answer (parquet checkpoints). No Spark session needed: this
  * is pure TxLog. */
object ProbeCkptCost {
  def main(args: Array[String]): Unit = {
    val tmp = Files.createTempDirectory("graft_ckptcost").toString
    // JIT warmup, excluded
    locally {
      val t = new TxLog(s"$tmp/warm")
      t.commit(v => LogCommit(v, adds = (0 until 500).map(i =>
        f"metric=m$i%02d/date=2024-01-01/w-$i%06d.parquet"),
        metrics = Seq("m"), dates = Seq("2024-01-01")))
      (0 until 3).foreach { _ =>
        t.writeCheckpoint(t.replay()); t.readCheckpoint(1L)
      }
    }
    val sizes = if (args.contains("--big")) Seq(100000, 300000, 1000000)
      else Seq(1000, 10000, 100000)
    sizes.foreach { n =>
      val log = new TxLog(s"$tmp/log$n")
      // adds spread over 100 commits (a realistic manifest mix), paths
      // shaped like real fold output
      val perCommit = n / 100
      (0 until 100).foreach { c =>
        log.commit(v => LogCommit(v, adds = (0 until perCommit).map(i =>
          f"metric=m${c % 40}%02d/date=2024-01-${c % 28 + 1}%02d/" +
            f"c$c%03d-$i%06d.parquet"),
          metrics = Seq(s"m${c % 40}"), dates = Seq(f"2024-01-${c % 28 + 1}%02d"),
          maxSeq = c.toLong))
      }
      val snap = log.replay()
      assert(snap.files.size == n)
      val w = (0 until 5).map { k =>
        // put-if-absent dedupes same-version checkpoints — write each
        // timing sample at a distinct version by committing one filler
        if (k > 0) log.commit(v => LogCommit(v, metrics = Seq("m0")))
        val s = log.replay()
        val t0 = System.nanoTime()
        log.writeCheckpoint(s)
        (System.nanoTime() - t0) / 1e6
      }
      val ckptV = log.latestCheckpoint().get
      val sidecar = log.checkpointFilesPath(ckptV)
      val size = Files.size(log.checkpointPath(ckptV)) +
        (if (Files.exists(sidecar)) Files.size(sidecar) else 0L)
      val r = (0 until 5).map { _ =>
        val t0 = System.nanoTime()
        log.readCheckpoint(ckptV)
        (System.nanoTime() - t0) / 1e6
      }
      println(f"[probe] n=$n%6d files: checkpoint size=${size / 1024}%6d KiB " +
        f"(${size.toDouble / n}%.0f B/file); write min/med " +
        f"${w.sorted.head}%7.1f / ${w.sorted.apply(2)}%7.1f ms; " +
        f"read min/med ${r.sorted.head}%7.1f / ${r.sorted.apply(2)}%7.1f ms")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
