package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17: step-level timing of connectedComponents' driver union-find path
  * over the curate-shaped LSH pair set. */
object ProbeCcSteps {
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
    import graft.pipeline.Dedup

    val docs = graft.tsdb.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    (0 until 2).foreach { round =>
      println(s"[cc] --- round $round ---")
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 8, 4, 0.8)
      t("pairs noop") { pairs.write.format("noop").mode("overwrite").save() }
      val pairs2 = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 8, 4, 0.8)
      val edges = pairs2.select(col("doc_a").as("a"), col("doc_b").as("b"))
      val und = edges.select(col("a"), col("b"))
        .union(edges.select(col("b").as("a"), col("a").as("b"))).cache()
      val n = t("und cache+count") { und.count() }
      println(s"[cc] edges=$n")
      val rows = t("und collect") { und.collect() }
      t("label join") {
        import spark.implicits._
        val labDf = rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
          .toDF("node", "__cc_label")
        docs.select(col("doc_id").as("node"))
          .join(broadcast(labDf), Seq("node"), "left")
          .select(col("node"), coalesce(col("__cc_label"), col("node")).as("label"))
          .write.format("noop").mode("overwrite").save()
      }
      und.unpersist()
      t("dupClusters full") {
        Dedup.dupClusters(docs.select(col("doc_id")), "doc_id",
            Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 8, 4, 0.8))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
