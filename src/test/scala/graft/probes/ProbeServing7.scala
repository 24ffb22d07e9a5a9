package graft

import org.apache.spark.sql.SparkSession

/** Throwaway round-7 serving-tier bisect probe: attributes cold/cached
  * qps to their sub-steps (local-tier filter scan, cache key build,
  * epoch lookup) so the r4→r6 driver-bench delta can be pinned to code
  * or to measurement environment. */
object ProbeServing7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe7").toString
    val engine = new graft.tsdb.TsdbEngine(spark, s"$tmp/db")
    engine.putDF(graft.tsdb.Tables.eventsAsPoints(spark, sfDir))
    val rnd = new scala.util.Random(42)
    def q(i: Int) = graft.tsdb.QueryParams("purchase",
      Map("user" -> (rnd.nextInt(100).toString)),
      startNs = 1704067200000000000L + i * 3600000000000L,
      endNs = Some(1704067200000000000L + (i + 24) * 3600000000000L))
    engine.queryCached(q(-1)) // warm local tier

    // cold: every query distinct (cache miss), 5 rounds of 100
    for (r <- 0 until 5) {
      val t0 = System.nanoTime()
      (0 until 100).foreach(i => engine.queryCached(q(r * 100 + i)))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"cold round $r: ${100 / s}%.0f qps (${s * 10}%.2f ms/q)")
    }
    // cached: same instance re-served
    val cq = q(0)
    engine.queryCached(cq)
    for (r <- 0 until 3) {
      val t0 = System.nanoTime()
      (0 until 20000).foreach(_ => engine.queryCached(cq))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"cached round $r: ${20000 / s}%.0f qps (${s * 50}%.3f us/q)")
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp)); ()
  }
}
