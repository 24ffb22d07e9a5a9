package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: sf0.1 → sf1 scale points for the round-8 additions
  * (delta/irate/predict on events; probe + bigram LM on documents,
  * which gen_sf.py scales 10× too). Median of 3 count-materialized. */
object ProbeNew8b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("ts_delta", "ts_irate", "ts_predict",
      "quality_probe_gram", "quality_probe_score", "lm_crossentropy")
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/sf1"); name <- names) {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROBE $dir $name%-22s median ${ts(1)}%.2f s")
    }
    spark.stop()
  }
}
