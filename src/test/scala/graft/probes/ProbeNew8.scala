package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement for SCALE.md, round-8 additions:
  * 1. delta/irate on the one-mega-series shape — unsplit vs `splitNs`
  *    (the lag family's escape hatch) vs predict (no window at all);
  * 2. quality-probe training across corpus replications — the one-scan
  *    Gram reduction should scale linearly with ONE driver row always.
  */
object ProbeNew8 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
    val p = QueryParams("hot", endNs = Some(n * StepNs + 1))
    val HourNs = 3600L * StepNs
    def time(what: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$what%-28s $s%6.1f s")
      s
    }
    for (pass <- 1 to 2) {
      println(s"-- pass $pass")
      time("delta unsplit")(TsAnalytics.rangeDelta(pts, p))
      time("delta split 1h")(TsAnalytics.rangeDelta(pts, p, splitNs = Some(HourNs)))
      time("irate unsplit")(TsAnalytics.irate(pts, p))
      time("irate split 1h")(TsAnalytics.irate(pts, p, splitNs = Some(HourNs)))
      time("predict unsplit")(TsAnalytics.predictLinear(pts, p, HourNs))
      time("predict split 1h")(TsAnalytics.predictLinear(pts, p, HourNs,
        splitNs = Some(HourNs)))
    }

    // probe training scaling: replicate the documents corpus
    import graft.pipeline.Probe
    val docs0 = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    for (mult <- Seq(1, 40, 400)) {
      val docs = docs0.crossJoin(
        spark.range(mult).select(col("id").as("rep"))).cache()
      val rows = docs.count()
      val fts = Probe.docFeatures(col("text"))
      val label = lit(1.0) + fts(0) * 2.0 + fts(1) * 3.0 - fts(2)
      val t0 = System.nanoTime()
      val w = Probe.fitRidge(docs, fts, label, lambda = 0.0)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"probe fit rows=$rows%9d  $s%6.2f s  w=${w.map(x => f"$x%.6f").mkString(",")}")
      docs.unpersist()
    }
    spark.stop()
  }
}
