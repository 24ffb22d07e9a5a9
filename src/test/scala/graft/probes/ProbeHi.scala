package graft
import org.apache.spark.sql.SparkSession

/** Throwaway probe: plan of embedding_neardup_hi. */
object ProbeHi {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Queries.embeddingNearDupHi(spark, sfDir)
    println(df.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("InMemory") || l.contains("Broadcast")).mkString("\n"))
    val t0 = System.nanoTime()
    df.count()
    println(f"exec: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
