package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17: quantify the single-row-group scan bottleneck — heavy per-row
  * work (regex scans, map building) runs on ONE task because each input
  * table is one parquet row group. Times representative queries with and
  * without a round-robin spread inserted after the scan. */
object ProbeSpread {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => DataFrame): Unit = {
      def mat(): Unit = f.write.format("noop").mode("overwrite").save()
      mat()
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); mat(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[spread] $tag%-28s min=${ts.min}%6.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val docs = graft.tsdb.Tables.load(spark, sfDir, "documents")
    val docsSpread = docs.repartition(cpus.toInt)

    // pii_scan shape (piiCounts + redact md5 over text)
    def pii(d: DataFrame): DataFrame =
      d.select(col("doc_id") +: (graft.pipeline.TextAnalysis.piiCounts(col("text")) :+
        md5(graft.pipeline.TextAnalysis.piiRedact(col("text"))).as("red_fp")): _*)
        .orderBy("doc_id")
    time("pii baseline") { pii(docs) }
    time("pii spread") { pii(docsSpread) }
    // lang_id shape
    time("langid baseline") {
      docs.select(col("doc_id"), graft.pipeline.TextAnalysis.langId(col("text")).as("predicted")).orderBy("doc_id") }
    time("langid spread") {
      docsSpread.select(col("doc_id"), graft.pipeline.TextAnalysis.langId(col("text")).as("predicted")).orderBy("doc_id") }
    // jaccard pairs
    time("jaccard baseline") {
      graft.pipeline.Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8) }
    time("jaccard spread") {
      graft.pipeline.Dedup.jaccardPairs(docsSpread, "doc_id", "text", n = 3, threshold = 0.8) }

    // events: ts_rate shape via slice
    val pts = graft.tsdb.Tables.eventsAsPoints(spark, sfDir)
    val raw = graft.tsdb.Tables.load(spark, sfDir, "events").repartition(cpus.toInt)
    val ptsSpread = raw.select(
      col("event_type").as("metric"),
      map(lit("user"), col("user_id").cast("string")).as("tags"),
      col("ts").as("timestamp"),
      map(
        lit("value"), struct(col("value").as("d"), lit(null).cast("long").as("l"),
          lit(null).cast("string").as("s"), lit(null).cast("boolean").as("b")),
        lit("props"), struct(lit(null).cast("double").as("d"), lit(null).cast("long").as("l"),
          col("props").as("s"), lit(null).cast("boolean").as("b"))
      ).as("fields"),
      col("event_id").as("seq"))
    val q = graft.tsdb.QueryParams("purchase", startNs = 0L,
      endNs = Some(4102444800000000000L))
    time("ts_rate baseline") { graft.tsdb.TsAnalytics.rate(pts, q) }
    time("ts_rate spread") { graft.tsdb.TsAnalytics.rate(ptsSpread, q) }
    // rollup build shape
    time("rollup_downsample baseline") {
      val oneMin = 60000000000L
      val rollup = graft.tsdb.Rollup.build(
        graft.tsdb.QueryEngine.mergedView(pts, Nil), oneMin, Seq("value"))
      graft.tsdb.Rollup.run(rollup, oneMin,
        q.copy(downsampleNs = Some(3600000000000L),
          endNs = Some(4102444800000000000L - 1),
          aggs = Seq(graft.tsdb.AggSpec("avg", "value"))))
    }
    time("rollup_downsample spread") {
      val oneMin = 60000000000L
      val rollup = graft.tsdb.Rollup.build(
        graft.tsdb.QueryEngine.mergedView(ptsSpread, Nil), oneMin, Seq("value"))
      graft.tsdb.Rollup.run(rollup, oneMin,
        q.copy(downsampleNs = Some(3600000000000L),
          endNs = Some(4102444800000000000L - 1),
          aggs = Seq(graft.tsdb.AggSpec("avg", "value"))))
    }
    spark.stop()
  }
}
