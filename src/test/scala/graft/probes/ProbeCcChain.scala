package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement for SCALE.md: distributed CC on an adversarial
  * long-chain graph — the shape where label propagation pays diameter
  * rounds and the star default pays O(log n). */
object ProbeCcChain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // one 1024-deep chain + 20k shallow (depth-10) chains = 201k nodes
    val deep = (0L until 1023L).map(i => (i, i + 1))
    val shallow = (0 until 20000).flatMap { c =>
      val base = 10000L + c * 10L
      (0L until 9L).map(i => (base + i, base + i + 1))
    }
    val edges = (deep ++ shallow).toDF("a", "b")
    val nodes = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node"))).distinct()
    println(s"nodes=${nodes.count()} edges=${edges.count()}")

    val t0 = System.nanoTime()
    val (starLabels, rounds) = graft.pipeline.Dedup.connectedComponentsStar(nodes, edges)
    val nStar = starLabels.filter(col("label") === 0L).count()
    println(f"star: rounds=$rounds chain0-size=$nStar ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val t1 = System.nanoTime()
    val lp = graft.pipeline.Dedup.connectedComponentsLabelProp(nodes, edges, maxIter = 50)
    val nLp = lp.filter(col("label") === 0L).count()
    println(f"labelProp(cap 50): chain0-size=$nLp of 1024 ${(System.nanoTime() - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
