package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: where does dedup_jaccard_pairs spend its time? */
object ProbeJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val docs = graft.tsdb.Tables.load(spark, sfDir, "documents")
    val sh = graft.pipeline.Dedup.shingled(docs, "doc_id", "text", 3)
    // warm
    sh.count()
    time("shingling alone")(sh.count())
    time("full jaccardPairs") {
      graft.pipeline.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
    }
    val shc = sh.persist()
    shc.count()
    time("jaccard w/ persisted sh (hack: count only)") {
      // emulate: posts/dfreq/verify over persisted shingles
      val posts = shc.select(col("doc"), col("nsh"), explode(col("sh")).as("s"))
        .select(col("doc"), col("nsh"), xxhash64(col("s")).as("h"))
      val dfreq = posts.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val prefixLen = (col("nsh") - ceil(col("nsh") * 0.8) + 1).cast("int")
      val prefix = posts.join(dfreq, "h").groupBy(col("doc"))
        .agg(first(col("nsh")).as("nsh"),
          array_sort(collect_list(struct(col("df"), col("h")))).as("ranked"))
        .select(col("doc"), explode(slice(col("ranked"), lit(1), prefixLen)).as("p"))
        .select(col("doc"), col("p.h").as("h"))
      val a = prefix.select(col("h"), col("doc").as("doc_a"))
      val b = prefix.select(col("h"), col("doc").as("doc_b"))
      val cand = a.join(b, Seq("h")).filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      val v = cand
        .join(shc.select(col("doc").as("doc_a"), col("sh").as("sh_a"), col("nsh").as("nsh_a")), "doc_a")
        .join(shc.select(col("doc").as("doc_b"), col("sh").as("sh_b"), col("nsh").as("nsh_b")), "doc_b")
        .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard", col("common").cast("double") /
          (col("nsh_a") + col("nsh_b") - col("common")).cast("double"))
        .filter(col("jaccard") >= 0.8)
      v.count()
    }
    spark.stop()
  }
}
