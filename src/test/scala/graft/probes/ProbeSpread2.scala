package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17: second spread sweep — remaining doc-scan-heavy battery shapes,
  * baseline vs round-robin spread after the single-row-group scan. */
object ProbeSpread2 {
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
    import graft.pipeline.{TextAnalysis => TAx, Dedup, Decontaminate, Curate, LangModel}

    def time(tag: String)(f: => DataFrame): Unit = {
      def mat(): Unit = f.write.format("noop").mode("overwrite").save()
      mat()
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); mat(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[spread2] $tag%-32s min=${ts.min}%6.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val docs = graft.tsdb.Tables.load(spark, sfDir, "documents")
    val docsSpread = docs.repartition(cpus.toInt)

    def both(tag: String)(f: DataFrame => DataFrame): Unit = {
      time(tag + " base") { f(docs) }
      time(tag + " spread") { f(docsSpread) }
    }

    both("doc_stats") { d =>
      val w = TAx.words(col("text"))
      d.select(col("doc_id"), size(w).as("n_tokens"),
        size(array_distinct(w)).as("n_uniq"),
        TAx.bpeishTokenCount(col("text")).as("n_bpeish"),
        length(col("text")).as("n_chars_measured"),
        floor(TAx.qualityScore(col("text")) * 10000 + 0.5).cast("long").as("quality_e4"))
        .orderBy("doc_id") }
    both("quality_score") { d =>
      d.select(col("doc_id"),
        floor(TAx.qualityScore(col("text")) * 1e4 + 0.5).cast("long").as("q"))
        .orderBy("doc_id") }
    both("doc_repetition") { d => TAx.repetitionStats(d, "doc_id", "text").orderBy("doc_id") }
    both("decontaminate") { d =>
      Decontaminate.contamination(d, d.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", 5, 1L) }
    both("exact_substring_cut") { d =>
      Dedup.exactSubstringCut(d, "doc_id", "text", n = 6, minDocs = 2L).orderBy("doc") }
    both("repeated_spans") { d =>
      Dedup.repeatedSpans(d, "doc_id", "text", n = 6, minDocs = 2L).orderBy("doc", "span_start") }
    both("lm_crossentropy") { d =>
      LangModel.selfCrossEntropy(d, "doc_id", "text", k = 0.5, hintBroadcast = true)
        .orderBy("doc_id") }
    both("curate") { d =>
      Curate.curate(d.select(col("doc_id"), col("text")), "doc_id", "text",
        allowedLangs = Set("en"), minQualityE4 = 3400L, jaccardThreshold = 0.8,
        evalDocs = Some(d.filter(col("doc_id") % 20 === 0).select(col("doc_id"), col("text"))),
        evalN = 5, evalMinHits = 3L) }
    both("minhash_lsh") { d =>
      Dedup.minhashLshPairs(d, "doc_id", "text", 3, 8, 4, 0.8) }
    both("winnow_overlap") { d =>
      Dedup.winnowOverlapPairs(d, "doc_id", "text", 3, 4, 3L, 50L) }
    spark.stop()
  }
}
