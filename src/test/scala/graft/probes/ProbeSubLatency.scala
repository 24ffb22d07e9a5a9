package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: measure subscription delivery through the r13 retained-rows
  * ring vs the parquet-read fallback (same puts, same socket). */
object ProbeSubLatency {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft_subp").toString
    val eng = new graft.tsdb.TsdbEngine(spark, s"$tmp/db")
    val ex = new graft.nbql.NbqlExecutor(eng)
    val srv = new graft.server.GraftTcpServer(ex, port = 0)
    srv.subscriptionPollMs = 50L
    srv.start()
    val sub = graft.client.NbqlClient.connect("127.0.0.1", srv.boundPort)
    def pt(i: Int) = graft.model.DataPoint("s.m", Map("h" -> "a"), i.toLong,
      Map("v" -> graft.model.FieldValue.ofDouble(i.toDouble)))
    try {
      // isolate the PER-COMMIT DELIVERY work (what each subscriber pays
      // per commit): the ring read vs the parquet read + Spark drain
      val filter = graft.streaming.PubSub.SubscriptionFilter("s.*", Map.empty)
      eng.recentPutsMaxCommits = 1024
      val v0 = eng.version
      (0 until 60).foreach(i => eng.putBatch(Seq(pt(i))))
      val versions = (v0 + 1) to eng.version
      // warm both paths
      versions.take(5).foreach { v =>
        eng.commitChangesLocal(v).foreach(_.foreach(identity))
        val (p, _) = eng.commitChanges(v)
        p.foreach(df => graft.streaming.PubSub.subscribe(df, filter)
          .orderBy("seq").toLocalIterator())
      }
      var t0 = System.nanoTime()
      var nItems = 0
      versions.foreach { v =>
        eng.commitChangesLocal(v).get.sortBy(_._2).foreach { case (p, _) =>
          if (graft.streaming.PubSub.matchesDriver(filter, p.metric, p.tags))
            nItems += 1
        }
      }
      val ringNs = System.nanoTime() - t0
      t0 = System.nanoTime()
      versions.foreach { v =>
        val (puts, _) = eng.commitChanges(v)
        puts.foreach { df =>
          val it = graft.streaming.PubSub.subscribe(df, filter)
            .orderBy("seq").toLocalIterator()
          while (it.hasNext) { it.next(); nItems += 1 }
        }
      }
      val parquetNs = System.nanoTime() - t0
      println(f"per-commit delivery: ring=${ringNs / 60e3}%.1f us  " +
        f"parquet+spark=${parquetNs / 60e6}%.2f ms  (items=$nItems)")
    } finally {
      try sub.close() catch { case _: Exception => () }
      srv.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    spark.stop()
  }
}
