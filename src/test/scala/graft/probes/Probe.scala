package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Throwaway stage-timing probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(df: => DataFrame): Unit = {
      val d = df
      d.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = graft.tsdb.Tables.load(spark, sfDir, "documents")
    val sh = Dedup.shingled(docs, "doc_id", "text", 3)
    t("shingled")(sh)
    t("posts(explode)")(sh.select(col("doc"), col("nsh"), explode(col("sh")).as("s")))
    val dfreq = sh.select(explode(col("sh")).as("s")).groupBy(col("s")).agg(count(lit(1)).as("df"))
    t("dfreq")(dfreq)
    t("jaccard full bcast")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6))
    t("jaccard full shuffle")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6, broadcastDict = false))
    t("minhash sigs")(Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8))
    t("minhash lsh")(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 8, 4, 0.6))
    t("simhash")(Dedup.simhash(docs, "doc_id", "text", 3))
    t("winnow fps")(Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4))
    t("winnow overlap")(Dedup.winnowOverlapPairs(docs, "doc_id", "text", 3, 4, 3L, 50L))
    val emb = graft.tsdb.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    t("neardup bucketed")(Similarity.cosinePairsBucketed(
      emb, threshold = 0.45, dim = 64))
    spark.stop()
  }
}
