package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: dump the round-6 battery additions at sf0.01 for a local
  * DuckDB oracle diff before the driver's gate runs them. */
object ProbeNew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("range_join_attrib", "ann_pq_topk")) {
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"/tmp/probe_new/$name")
    }
    spark.stop()
  }
}
