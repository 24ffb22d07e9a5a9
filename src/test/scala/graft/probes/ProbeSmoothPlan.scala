package graft.probes

import org.apache.spark.sql.SparkSession
import graft.tsdb._

/** Plan audit for the round-10 smoothing rollup (SCALE.md): the
  * smoothing pass must not add an exchange to the build (the per-series
  * window rides the same hash partitioning the per-(series, window)
  * pass clusters on), and the routed read stays a filter + one
  * re-aggregation exchange over rollup rows.
  * Run: `sbt "Test/runMain graft.probes.ProbeSmoothPlan"`. */
object ProbeSmoothPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pts = Tables.eventsAsPoints(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("metric") === "purchase")
    val sm = SmoothSpec("value", "ewma", 0.25)
    val rollup = Rollup.build(QueryEngine.mergedView(pts, Nil),
      3600000000000L, Seq("value"), smooth = Seq(sm))
    def count(s: String, what: String) = what.r.findAllIn(s).length
    val plan = rollup.queryExecution.executedPlan.toString
    println(s"BUILD+SMOOTH exchanges=${count(plan, "Exchange")} sorts=${count(plan, "Sort ")}")
    val p0 = Rollup.build(QueryEngine.mergedView(pts, Nil),
      3600000000000L, Seq("value")).queryExecution.executedPlan.toString
    println(s"BUILD BASE   exchanges=${count(p0, "Exchange")} sorts=${count(p0, "Sort ")}")
    val q = QueryParams("purchase", startNs = 0L,
      endNs = Some(4102444799999999999L))
    val served = Rollup.runSmoothBy(rollup.persist(), 3600000000000L, q,
      sm, 24L * 3600000000000L)
    served.count()
    val ps = served.queryExecution.executedPlan.toString
    println(s"SERVE        exchanges=${count(ps, "Exchange")}")
    println(served.queryExecution.executedPlan.treeString.take(2200))
    spark.stop()
  }
}
