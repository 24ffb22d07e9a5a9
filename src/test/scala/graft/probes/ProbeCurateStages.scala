package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: per-stage timing of the curation pipeline at sf1. */
object ProbeCurateStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.tsdb.Tables.load(spark, sfDir, "documents")
    t("signals count") {
      docs.select(TextAnalysis.langId(col("text")).as("l"),
        floor(TextAnalysis.qualityScore(col("text")) * 1e4).as("q")).count()
    }
    t("exact groups") {
      docs.withColumn("fp", TextAnalysis.fingerprint(col("text")))
        .groupBy("fp").agg(min(col("doc_id"))).count()
    }
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 8, 4, 0.6)
    t("lsh pairs")(pairs.count())
    val p2 = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 8, 4, 0.6)
    t("dupClusters")(Dedup.dupClusters(docs, "doc_id", p2).count())
    spark.stop()
  }
}
