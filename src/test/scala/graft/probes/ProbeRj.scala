package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: isolate range_join_attrib wall-clock at sf0.1 (bench drift
  * check) + confirm the auto-rewrite plan shape. */
object ProbeRj {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("range_join_attrib")(spark, dir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    val p = SparkEntry.queries("range_join_attrib")(spark, dir)
      .queryExecution.executedPlan.toString
    println("BNLJ=" + p.linesIterator.count(_.contains("BroadcastNestedLoop")) +
      " SMJ=" + p.linesIterator.count(_.contains("SortMergeJoin")) +
      " BHJ=" + p.linesIterator.count(_.contains("BroadcastHashJoin")) +
      " Exchanges=" + p.linesIterator.count(_.contains("Exchange")))
    spark.stop()
  }
}
