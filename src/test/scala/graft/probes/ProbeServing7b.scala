package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: cost of the budget-probe on the SPARK serving path (local
  * tier disabled) — executeTake's incremental job batches vs a single
  * all-partition job via spark.sql.limit.initialNumPartitions. */
object ProbeServing7b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe7b").toString
    val engine = new graft.tsdb.TsdbEngine(spark, s"$tmp/db")
    engine.putDF(graft.tsdb.Tables.eventsAsPoints(spark, sfDir))
    engine.localServingMaxRows = 0L // force the Spark path
    val rnd = new scala.util.Random(42)
    def q(i: Int) = graft.tsdb.QueryParams("purchase",
      Map("user" -> (rnd.nextInt(100).toString)),
      startNs = 1704067200000000000L + i * 3600000000000L,
      endNs = Some(1704067200000000000L + (i + 24) * 3600000000000L))
    (0 until 40).foreach(i => engine.queryCached(q(1000 + i))) // warm
    var base = 0
    for (init <- Seq("1", "64", "1", "64")) {
      spark.conf.set("spark.sql.limit.initialNumPartitions", init)
      base += 10000
      val b = base
      val t0 = System.nanoTime()
      val n = 40
      (0 until n).foreach(i => engine.queryCached(q(b + i)))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"initialNumPartitions=$init%-3s cold-spark: ${n / s}%.0f qps (${s * 1000 / n}%.1f ms/q)")
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp)); ()
  }
}
