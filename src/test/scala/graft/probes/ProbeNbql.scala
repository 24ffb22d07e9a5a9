package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Throwaway parity probe: the NBQL protocol-path battery entries must
  * row-match their engine-direct twins (not part of the library surface). */
object ProbeNbql {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def cmp(name: String, a: DataFrame, b: DataFrame): Unit = {
      val d1 = a.exceptAll(b).count()
      val d2 = b.exceptAll(a).count()
      val n = a.count()
      println(s"$name: rows=$n diffA=$d1 diffB=$d2 " +
        (if (d1 == 0 && d2 == 0 && n > 0) "OK" else "MISMATCH"))
    }
    cmp("nbql_query_e2e vs tsdb_downsample_1h",
      Queries.nbqlQueryE2e(spark, sfDir), Queries.tsdbDownsample1h(spark, sfDir))
    cmp("nbql_rate vs ts_rate",
      Queries.nbqlRate(spark, sfDir), Queries.tsRate(spark, sfDir))
    spark.stop()
  }
}
