package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 probe: `range_join_attrib` is the sf1 battery's worst query
  * by 20× (313 s vs ≤17 s everything else). The candidate volume is
  * inherent — keyless 30-min windows over a fixed 30-day span make true
  * pairs grow ~SF² (sf1: ~76M) — so attribute the 313 s between the
  * bin-and-verify join itself and the aggregation ON TOP of it
  * (`countDistinct` plans through RewriteDistinctAggregates: an Expand
  * doubling the 76M-row exchange). Stages timed separately:
  * join+count(1) (join cost), the shipped single-groupBy countDistinct
  * shape, and a manual two-level distinct (groupBy (purchase, user)
  * then purchase) that avoids the Expand. */
object ProbeRangeJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    val existing = s.experimental.extraOptimizations
    if (!existing.contains(graft.plans.RangeJoinRewrite))
      s.experimental.extraOptimizations = existing :+ graft.plans.RangeJoinRewrite
    val HalfHourNs = 30L * 60L * 1000000000L
    val ev = graft.tsdb.Tables.load(s, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"),
        (col("ts") + HalfHourNs).as("p_end"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("ts").as("c_ts"), col("user_id").as("click_user"))
    def joined = purchases.join(clicks,
      col("c_ts") >= col("p_ts") && col("c_ts") <= col("p_end"))
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time("pair count (join only)") {
      println("[probe] pairs = " + joined.count())
    }
    time("shipped shape: groupBy(purchase).agg(count, countDistinct, min)") {
      joined.groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_clicks"),
          countDistinct(col("click_user")).as("n_users"),
          min(col("c_ts")).as("first_click_ts"))
        .write.format("noop").mode("overwrite").save()
    }
    time("two-level distinct: groupBy(purchase,user) then purchase") {
      joined.groupBy(col("purchase_id"), col("click_user"))
        .agg(count(lit(1)).as("c"), min(col("c_ts")).as("m"))
        .groupBy(col("purchase_id"))
        .agg(sum(col("c")).as("n_clicks"),
          count(lit(1)).as("n_users"),
          min(col("m")).as("first_click_ts"))
        .write.format("noop").mode("overwrite").save()
    }
    s.experimental.extraOptimizations = existing
  }
}
