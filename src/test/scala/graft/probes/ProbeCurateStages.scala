package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17: per-stage decomposition of curate_lineage — which of the five
  * stages (signals, exact dedup, LSH pairs, CC+rank, decontaminate,
  * final join) owns the 8.6 s. Each sub-pipeline is materialized
  * cumulative-prefix style so stage cost = delta. */
object ProbeCurateStages {
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
    import graft.pipeline.{Curate, Dedup, TextAnalysis => TAx, Decontaminate}

    def time(tag: String)(f: => DataFrame): Unit = {
      def mat(): Unit = f.write.format("noop").mode("overwrite").save()
      mat()
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); mat(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[curate] $tag%-28s min=${ts.min}%6.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val docs0 = graft.tsdb.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val planted = docs0.filter(col("doc_id") < 15)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val german = spark.range(1).select(lit(200000L).as("doc_id"),
      lit("der die und das der die und das der die und das").as("text"))
    val docs = docs0.unionByName(planted).unionByName(german)

    // stage 1: signals (langId + quality over all docs)
    val scoredE4 =
      floor(TAx.qualityScore(col("text")) * 1e4 + 0.5).cast("long")
    time("signals") {
      docs.select(col("doc_id"), TAx.langId(col("text")).as("__lang"),
        scoredE4.as("__q"))
    }
    val signals = docs.select(col("doc_id"), col("text"),
      TAx.langId(col("text")).as("__lang"), scoredE4.as("__q"))
    val qualOk = signals.filter(col("__lang").isin("en") && col("__q") >= 3400L)
    // stage 2: exact dedup over survivors
    time("exact groups") {
      qualOk.withColumn("__fp", TAx.fingerprint(col("text")))
        .groupBy(col("__fp")).agg(min(col("doc_id")).as("__keep_id"))
    }
    val exactOkText = qualOk // approximation: survivors ≈ qualOk
      .select(col("doc_id"), col("text"))
    // stage 3: LSH pairs over exact survivors
    time("lsh pairs") {
      Dedup.minhashLshPairs(exactOkText, "doc_id", "text", 3, 8, 4, 0.8)
    }
    // stage 4: clusters (CC)
    time("clusters") {
      Dedup.dupClusters(exactOkText.select(col("doc_id")), "doc_id",
        Dedup.minhashLshPairs(exactOkText, "doc_id", "text", 3, 8, 4, 0.8))
    }
    // stage 5: decontamination alone
    val evalDocs = docs.filter(col("doc_id") % 20 === 0)
    time("decontaminate") {
      Decontaminate.contamination(docs, evalDocs, "doc_id", "text", 5, 3L)
    }
    // full composed
    time("FULL curate") {
      Curate.curate(docs, "doc_id", "text",
        allowedLangs = Set("en"), minQualityE4 = 3400L,
        jaccardThreshold = 0.8, evalDocs = Some(evalDocs),
        evalN = 5, evalMinHits = 3L)
    }
    spark.stop()
  }
}
