package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement for SCALE.md: hot-series time-splitting on the
  * pathological shape — ONE series holding every row, where the default
  * per-series window serializes into a single task and `splitNs` is the
  * escape hatch (`TsAnalytics` header; `TsSplitSpec` pins semantics,
  * this pins wall-clock). */
object ProbeSplit {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one series, n points at 1 s cadence (~23 days at n = 2M)
    val StepNs = 1000000000L
    val pts = spark.range(n).select(
      lit("hot").as("metric"),
      map(lit("h"), lit("1")).as("tags"),
      (col("id") * StepNs).as("timestamp"),
      map(lit("value"), struct(
        (sin(col("id") / 1000.0) * 50 + rand(7) * 10).as("d"),
        lit(null).cast("long").as("l"), lit(null).cast("string").as("s"),
        lit(null).cast("boolean").as("b"))).as("fields"),
      col("id").as("seq"))
      .cache()
    println(s"rows=${pts.count()}")

    import graft.tsdb._
    val p = QueryParams("hot", endNs = Some(n * StepNs + 1),
      downsampleNs = Some(3600L * StepNs))
    val HourNs = 3600L * StepNs
    def time(what: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$what%-28s $s%6.1f s")
      s
    }
    for (pass <- 1 to 2) { // pass 1 = warmup (codegen/JIT), pass 2 = report
      println(s"-- pass $pass")
      time("rate unsplit")(TsAnalytics.rate(pts, p))
      time("rate split 1h")(TsAnalytics.rate(pts, p, splitNs = Some(HourNs)))
      time("twa unsplit")(TsAnalytics.timeWeightedAvg(pts, p))
      time("twa split 1h")(TsAnalytics.timeWeightedAvg(pts, p, splitNs = Some(HourNs)))
      time("ewma unsplit")(TsAnalytics.ewmaSmooth(pts, p, alpha = 0.2))
      time("ewma split 1h")(TsAnalytics.ewmaSmooth(pts, p, alpha = 0.2,
        splitNs = Some(HourNs)))
      time("holt unsplit")(TsAnalytics.holtSmooth(pts, p, alpha = 0.2, beta = 0.1))
      time("holt split 1h")(TsAnalytics.holtSmooth(pts, p, alpha = 0.2, beta = 0.1,
        splitNs = Some(HourNs)))
      time("zscore unsplit")(TsAnalytics.rollingZScore(pts, p, lookback = 20))
      time("zscore split 1h")(TsAnalytics.rollingZScore(pts, p, lookback = 20,
        splitNs = Some(HourNs)))
      time("cumsum unsplit")(TsAnalytics.runningAggregates(pts, p))
      time("cumsum split 1h")(TsAnalytics.runningAggregates(pts, p,
        splitNs = Some(HourNs)))
    }
    spark.stop()
  }
}
