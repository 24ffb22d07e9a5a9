package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: attribute the ~20 ms/file staging-write cost seen by
  * ProbeStreamIngest — is it JSON parse parallelism, dynamic-partition
  * dir count, codec init, or the Hadoop commit protocol? */
object ProbeWriteCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft_wc").toString
    def t[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-46s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val pts = graft.tsdb.Tables.eventsAsPoints(spark, sfDir)
    pts.drop("seq").toJSON.toDF("value").repartition(8)
      .write.text(s"$tmp/in")
    // one micro-batch-equivalent: 2 of the 8 files
    val two = java.nio.file.Files.list(java.nio.file.Paths.get(s"$tmp/in"))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val files = {
      val b = Seq.newBuilder[String]
      while (two.hasNext) { val p = two.next(); if (p.toString.endsWith(".txt")) b += p.toString }
      b.result().sorted.take(2)
    }
    val batch = spark.read.text(files: _*).toDF("value")
    val parsed = graft.streaming.Ingest.parse(batch)
      .filter(!col("_rejected")).drop("_rejected")
      .withColumn("tags", coalesce(col("tags"), map()))
      .withColumn("seq", monotonically_increasing_id())
      .withColumn("date", graft.tsdb.TsdbEngine.dateOfTs(col("timestamp")))
    println(s"batch rows = ${parsed.count()} over " +
      s"${parsed.select("metric", "date").distinct().count()} (metric,date) dirs")
    t("warm: full clustered write")(
      parsed.repartition(col("metric"), col("date"))
        .write.partitionBy("metric", "date").parquet(s"$tmp/w0"))
    t("parse only (count)")(parsed.count())
    t("parse+shuffle only (count after repartition)")(
      parsed.repartition(col("metric"), col("date")).count())
    t("clustered write, snappy (the ingest shape)")(
      parsed.repartition(col("metric"), col("date"))
        .write.partitionBy("metric", "date").parquet(s"$tmp/w1"))
    t("clustered write, uncompressed")(
      parsed.repartition(col("metric"), col("date"))
        .write.option("compression", "uncompressed")
        .partitionBy("metric", "date").parquet(s"$tmp/w2"))
    t("single-dir write (32 files, no partitionBy)")(
      parsed.repartition(32).write.parquet(s"$tmp/w3"))
    t("single-file write (coalesce 1, no partitionBy)")(
      parsed.coalesce(1).write.parquet(s"$tmp/w4"))
    t("clustered write, committer v2")(
      parsed.repartition(col("metric"), col("date"))
        .write.option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .partitionBy("metric", "date").parquet(s"$tmp/w5"))
    // date-only clustering: 30 dirs instead of 150
    t("date-only partitionBy (30 dirs)")(
      parsed.repartition(col("date"))
        .write.partitionBy("date").parquet(s"$tmp/w6"))
    t("clustered write, EXPLICIT 32 partitions")(
      parsed.repartition(32, col("metric"), col("date"))
        .write.partitionBy("metric", "date").parquet(s"$tmp/w7"))
    println("  shuffle partitions actually written (AQE view): " +
      parsed.repartition(col("metric"), col("date")).rdd.getNumPartitions +
      " keyed vs " +
      parsed.repartition(32, col("metric"), col("date")).rdd.getNumPartitions +
      " explicit")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
