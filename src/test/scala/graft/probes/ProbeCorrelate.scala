package graft

import org.apache.spark.sql.SparkSession

/** Round-14 adjudication probe (VERDICT r13 "What's wrong #2"):
  * `qps_correlate_raw` read 1.19 qps in r12 and 0.10 in r13 — 12× down,
  * far outside the documented 1.6-2.0× machine offset and the 1.5×
  * serving noise band, while the battery's `ts_correlate` and
  * `nbql_correlate` sat at offset level. This replicates the bench's
  * correlate block EXACTLY (same engine load, same warm, same
  * passes3 shape) and then per-stage decomposes the raw
  * `engine.analyze(AnalyzeCorrelate)` path so a reproduced regression
  * is attributable instead of mysterious. */
object ProbeCorrelate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft_corr").toString
    val pts = graft.tsdb.Tables.eventsAsPoints(spark, sfDir)
    val engine = new graft.tsdb.TsdbEngine(spark, s"$tmp/db")
    engine.putDF(pts)
    val DayNs = graft.tsdb.TsdbEngine.DayNs
    def corq(i: Int) = graft.tsdb.AnalyzeCorrelate("value", "view", "user",
      DayNs, 2 + (i % 5))
    val cp = graft.tsdb.QueryParams("purchase",
      startNs = 1704067200000000000L,
      endNs = Some(1704067200000000000L + 30L * DayNs - 1))
    engine.analyze(cp, corq(0)).count() // warm (same as Bench)
    val raw = (0 until 3).map { p =>
      val t0 = System.nanoTime()
      var k = 0
      while (k < 3) { engine.analyze(cp, corq(p * 3 + k)).count(); k += 1 }
      3 / ((System.nanoTime() - t0) / 1e9)
    }
    println(s"qps_correlate_raw passes: ${raw.map(q => f"$q%.3f").mkString(", ")} " +
      f"(median ${raw.sorted.apply(1)}%.3f; r12=1.19 r13=0.10)")
    // rollup-routed twin, for the same ratio the bench reports
    engine.registerRollup("purchase", DayNs, Seq("value"))
    engine.registerRollup("view", DayNs, Seq("value"))
    engine.analyze(cp, corq(0)).count()
    val routed = (0 until 3).map { p =>
      val t0 = System.nanoTime()
      var k = 0
      while (k < 10) { engine.analyze(cp, corq(30 + p * 10 + k)).count(); k += 1 }
      10 / ((System.nanoTime() - t0) / 1e9)
    }
    println(s"qps_correlate_rollup passes: " +
      routed.map(q => f"$q%.3f").mkString(", ") +
      f" (median ${routed.sorted.apply(1)}%.3f; r12=3.51 r13=1.65)")
    // per-call decomposition of the raw path across the 5 minBuckets
    // variants: is any single shape the regression?
    engine.dropRollup("purchase"); engine.dropRollup("view")
    (0 until 5).foreach { i =>
      val t0 = System.nanoTime()
      engine.analyze(cp, corq(i)).count()
      println(f"  raw corq($i) minBuckets=${2 + (i % 5)}: " +
        f"${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
