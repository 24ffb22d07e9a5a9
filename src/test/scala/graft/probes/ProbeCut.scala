package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: dump exact_substring_cut (and repeated_spans) at sf0.01
  * for a local DuckDB diff of the r05 hash mismatch. */
object ProbeCut {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Queries.exactSubstringCut(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet("/tmp/probe_cut")
    Queries.repeatedSpans(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet("/tmp/probe_spans")
    spark.stop()
  }
}
