package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: assert plan shapes hold at a given SF dir (used for the
  * sf1 10x scale-up audit in SCALE.md; not part of the library surface). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq(
      "dedup_jaccard_pairs", "dedup_minhash_lsh", "embedding_neardup",
      "embedding_neardup_ivf", "ann_lsh_topk", "ann_ivf_topk",
      "tsdb_downsample_1h", "tsdb_raw_scan", "pushdown_scan",
      // round-3 additions
      "dedup_incremental", "dedup_canonical", "shard_assign",
      "ngram_topk", "tfidf_topterms", "kmeans_assign",
      "embedding_quantize", "winnow_overlap_pairs", "simhash_neardup")
    // running-frame windows whose partition size is bounded by
    // construction (shard_assign: <= bucketWidth rows per bucket) — a
    // rank pushdown cannot exist there, and none is needed
    val boundedWindowByDesign = Set("shard_assign")
    var bad = 0
    for (name <- interesting) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoop")
      // A Window node is fine iff Spark pushed the rank limit down
      // (WindowGroupLimit = bounded per-group heap); an unbounded Window
      // over a big partition is the scale hazard.
      val window = plan.linesIterator.exists(_.contains("Window ["))
      val grouplimited = plan.linesIterator.exists(_.contains("WindowGroupLimit"))
      val ok = !cartesian &&
        (!window || grouplimited || boundedWindowByDesign(name))
      if (!ok) bad += 1
      println(f"$name%-28s cartesian=$cartesian%-5s window=$window%-5s grouplimit=$grouplimited%-5s ${if (ok) "OK" else "BAD"}")
    }
    println(s"plan probe: ${interesting.size - bad}/${interesting.size} OK")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
