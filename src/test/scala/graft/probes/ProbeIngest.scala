package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: stage-time the bulk ingest path (bench ingest regression). */
object ProbeIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ing").toString
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pts = graft.tsdb.Tables.eventsAsPoints(spark, sfDir).cache()
    t("cache count")(pts.count())
    new graft.tsdb.TsdbEngine(spark, s"$tmp/warm").putDF(pts.limit(1000))
    val e = new graft.tsdb.TsdbEngine(spark, s"$tmp/db")
    t("putDF full")(e.putDF(pts))
    // raw write path without the engine, for comparison
    t("bare clustered write") {
      pts.withColumn("date", graft.tsdb.TsdbEngine.dateOfTs(col("timestamp")))
        .repartition(col("metric"), col("date"))
        .write.partitionBy("metric", "date").parquet(s"$tmp/bare")
    }
    t("second putDF")(e.putDF(pts))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
