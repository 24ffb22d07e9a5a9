package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: time the TS-analytics battery entries at a given sf dir
  * (count-mode, median of 3) for SCALE.md's sf0.1 → sf1 curve. */
object ProbeTs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("ts_rate", "ts_anomaly", "ts_twa", "ts_cumsum", "ts_ewma",
      "ts_holt", "ts_ratio", "ts_topk_series", "ts_correlate",
      "ts_cardinality", "tsdb_groupby_tag",
      "tsdb_fill_previous", "tsdb_fill_linear", "zorder_scan")
    for (name <- names) {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROBE $name%-20s median ${ts(1)}%.2f s  (runs ${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
