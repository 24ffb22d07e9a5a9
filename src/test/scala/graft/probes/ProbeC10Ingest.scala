package graft

import graft.model.{DataPoint, FieldValue}
import org.apache.spark.sql.SparkSession

/** Throwaway: decompose the concurrent wire-ingest key
  * (`ingest_rows_per_sec_c10`): is the cost the framed wire, the
  * per-batch Spark write job, or 10 writers contending on the
  * optimistic log commit? Ladder: serial direct putBatch → 10-thread
  * direct putBatch (contention, no wire) → full wire c10 (the bench
  * shape: 10 clients × PUSHS batches of 500). */
object ProbeC10Ingest {
  private def batch(tid: Int, b: Int, sz: Int): Seq[DataPoint] =
    (0 until sz).map { j =>
      val i = tid * 1000000 + b * sz + j
      DataPoint("purchase", Map("user" -> s"${i % 100}"),
        1704067200000000000L + i.toLong * 1000000L,
        Map("value" -> FieldValue.ofDouble((i % 997).toDouble)))
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft_c10i").toString
    val refOnly = sys.env.get("SPARK_GRAFT_REF_ONLY").contains("1")
    val (threads, perT) = (10, 4)
    try {
      // warmup: codegen + committer
      val w = new graft.tsdb.TsdbEngine(spark, s"$tmp/warm")
      (0 until 8).foreach(b => w.putBatch(batch(0, b, 500)))

      if (!refOnly) {
      // 1. serial direct putBatch
      val e1 = new graft.tsdb.TsdbEngine(spark, s"$tmp/serial")
      val n1 = 20
      val t1 = System.nanoTime()
      (0 until n1).foreach(b => e1.putBatch(batch(0, b, 500)).fold(sys.error, identity))
      val serialS = (System.nanoTime() - t1) / 1e9
      println(f"serial putBatch:   ${serialS / n1 * 1000}%6.1f ms/batch  " +
        f"${n1 * 500 / serialS}%8.0f rows/s")

      // 2. 10-thread direct putBatch (commit contention, no wire)
      val e2 = new graft.tsdb.TsdbEngine(spark, s"$tmp/conc")
      val t2 = System.nanoTime()
      val ts = (0 until threads).map { tid =>
        val t = new Thread(() => (0 until perT).foreach(b =>
          e2.putBatch(batch(tid, b, 500)).fold(sys.error, identity)))
        t.start(); t
      }
      ts.foreach(_.join())
      val concS = (System.nanoTime() - t2) / 1e9
      println(f"c10 direct:        ${concS / (threads * perT) * 1000}%6.1f ms/batch  " +
        f"${threads * perT * 500 / concS}%8.0f rows/s")

      // 3. full wire c10 (the bench shape)
      val e3 = new graft.tsdb.TsdbEngine(spark, s"$tmp/wire")
      val srv = new graft.server.GraftTcpServer(new graft.nbql.NbqlExecutor(e3))
      srv.start()
      try {
        val writers = (0 until threads).map(_ =>
          graft.client.NbqlClient.connect("127.0.0.1", srv.boundPort))
        val t3 = System.nanoTime()
        val wts = writers.zipWithIndex.map { case (c, tid) =>
          val t = new Thread(() => (0 until perT).foreach { b =>
            c.pushBulk(batch(tid, b, 500).map(p =>
              (p.metric, p.tags, p.timestamp, p.fields)))
          })
          t.start(); t
        }
        wts.foreach(_.join())
        val wireS = (System.nanoTime() - t3) / 1e9
        println(f"c10 wire:          ${wireS / (threads * perT) * 1000}%6.1f ms/batch  " +
          f"${threads * perT * 500 / wireS}%8.0f rows/s")
        writers.foreach(_.close())
      } finally srv.stop()
      } // !refOnly

      // 4. the REFERENCE write protocol end-to-end: 1M points, batch
      //    1000, 10 concurrent wire writers (cmd/perf-client/main.go:
      //    52-56) — includes every inline fold the run triggers
      if (sys.env.get("SPARK_GRAFT_REF_PROTOCOL").contains("1")) {
        val e4 = new graft.tsdb.TsdbEngine(spark, s"$tmp/refproto")
        val srv4 = new graft.server.GraftTcpServer(new graft.nbql.NbqlExecutor(e4))
        srv4.start()
        try {
          val (bsz, perW) = (1000, 100) // 10 x 100 x 1000 = 1M points
          val writers = (0 until threads).map(_ =>
            graft.client.NbqlClient.connect("127.0.0.1", srv4.boundPort))
          val t4 = System.nanoTime()
          val wts = writers.zipWithIndex.map { case (c, tid) =>
            val t = new Thread(() => (0 until perW).foreach { b =>
              c.pushBulk(batch(tid, b, bsz).map(p =>
                (p.metric, p.tags, p.timestamp, p.fields)))
            })
            t.start(); t
          }
          wts.foreach(_.join())
          val s4 = (System.nanoTime() - t4) / 1e9
          println(f"ref protocol (1M pts, batch 1000, c10): $s4%6.1f s  " +
            f"${threads * perW * bsz / s4}%8.0f rows/s  " +
            s"inline_live=${e4.inlineCommitCount} files=${e4.fileCounts}")
          val n = e4.loadPoints().map(_.count()).getOrElse(0L)
          println(s"ref protocol row integrity: stored=$n expected=${threads * perW * bsz}" +
            (if (n == threads * perW * bsz) " OK" else " **LOSS**"))
          writers.foreach(_.close())
        } finally srv4.stop()
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp)); ()
    }
    spark.stop()
  }
}
