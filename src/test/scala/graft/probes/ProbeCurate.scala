package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: time the end-to-end curation pipeline at a given SF. */
object ProbeCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.tsdb.Tables.load(spark, sfDir, "documents")
    val evalSet = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("text"))
    def run(): Map[String, Long] = graft.pipeline.Curate.stageCounts(
      graft.pipeline.Curate.curate(docs, "doc_id", "text",
        allowedLangs = Set("en", "de", "es", "fr", "zh"),
        minQualityE4 = 1000L, evalDocs = Some(evalSet)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    run() // warmup
    val t0 = System.nanoTime()
    val counts = run()
    println(f"curate ${(System.nanoTime() - t0) / 1e9}%.2f s  $counts")
    spark.stop()
  }
}
