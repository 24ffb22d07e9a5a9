package graft

import org.apache.spark.sql.SparkSession

/** Throwaway serving-latency breakdown probe (not part of the library
  * surface): splits a cold dashboard query into plan-build, analysis+
  * optimization+codegen, and job-execution time on both the raw and the
  * serving-view paths. */
object ProbeServe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe").toString
    val engine = new graft.tsdb.TsdbEngine(spark, s"$tmp/db")
    val pts = graft.tsdb.Tables.eventsAsPoints(spark, sfDir)
    engine.putDF(pts)
    val rnd = new scala.util.Random(42)
    def q(i: Int) = graft.tsdb.QueryParams("purchase",
      Map("user" -> (rnd.nextInt(100).toString)),
      startNs = 1704067200000000000L + i * 3600000000000L,
      endNs = Some(1704067200000000000L + (i + 24) * 3600000000000L))
    // warm both paths
    engine.query(q(-1)).collect(); engine.queryServing(q(-2)).collect()
    val sv = engine.servingView("purchase")
    println(s"serving view: ${sv.count()} rows in ${sv.rdd.getNumPartitions} partitions")
    val t0 = System.nanoTime()
    sv.filter(org.apache.spark.sql.functions.col("timestamp")
      .between(1704067200000000000L, 1704067200000000000L + 24 * 3600000000000L)).collect()
    println(f"bare ts-filter collect: ${(System.nanoTime() - t0) / 1e6}%.1fms")
    // decompose one unordered serving query: raw job vs row decode vs repeat
    val dfx = graft.tsdb.QueryEngine.runMerged(sv, q(3), ordered = false)
    val plan3 = dfx.queryExecution.executedPlan
    val ta = System.nanoTime(); plan3.execute().count()
    println(f"  job-only first: ${(System.nanoTime() - ta) / 1e6}%.1fms")
    val tb = System.nanoTime(); plan3.execute().count()
    println(f"  job-only again: ${(System.nanoTime() - tb) / 1e6}%.1fms")
    val tc = System.nanoTime(); dfx.collect()
    println(f"  collect after warm: ${(System.nanoTime() - tc) / 1e6}%.1fms")
    val td = System.nanoTime(); dfx.collect()
    println(f"  collect again: ${(System.nanoTime() - td) / 1e6}%.1fms")
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    for (path <- Seq("raw", "serving", "unordered", "unordered-nocodegen")) {
      if (path == "unordered-nocodegen")
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
      var build = 0.0; var plan = 0.0; var exec = 0.0
      for (i <- 0 until 20) {
        val t0 = System.nanoTime()
        val df = path match {
          case "raw" => engine.query(q(i))
          case "serving" => engine.queryServing(q(i))
          case "unordered-nocodegen" => graft.tsdb.QueryEngine.runMerged(
            engine.servingView("purchase"), q(i), ordered = false)
          case _ => graft.tsdb.QueryEngine.runMerged(
            engine.servingView("purchase"), q(i), ordered = false)
        }
        val t1 = System.nanoTime(); build += ms(t0) - ms(t1) + (t1 - t0) / 1e6
        df.queryExecution.executedPlan // force analysis→physical planning
        val t2 = System.nanoTime(); plan += (t2 - t1) / 1e6
        df.collect()
        exec += ms(t2)
      }
      println(f"$path%-10s build=${build / 20}%.1fms plan=${plan / 20}%.1fms exec=${exec / 20}%.1fms")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
