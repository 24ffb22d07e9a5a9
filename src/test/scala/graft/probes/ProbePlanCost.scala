package graft

import org.apache.spark.sql.SparkSession

/** r17: driver-side planning cost per query — analysis vs optimization
  * vs physical planning, timed on a warm session. */
object ProbePlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = if (args.nonEmpty) args.toSeq
      else Seq("tsdb_rollup_downsample", "ts_rate", "curate_lineage")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm (codegen, file listing, JIT)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (0 until 2).foreach { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.analyzed
        val t2 = System.nanoTime()
        qe.optimizedPlan
        val t3 = System.nanoTime()
        qe.executedPlan
        val t4 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t5 = System.nanoTime()
        def ms(a: Long, b: Long) = (b - a) / 1e6
        println(f"[plancost] $name%-26s construct=${ms(t0,t1)}%6.0f analyze=${ms(t1,t2)}%6.0f optimize=${ms(t2,t3)}%6.0f physical=${ms(t3,t4)}%6.0f execute=${ms(t4,t5)}%6.0f")
      }
    }
    spark.stop()
  }
}
