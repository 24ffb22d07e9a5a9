package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** r17 optimization probe: per-query job/stage/task accounting + formatted
  * plans. For each named battery query (args, or all when none given):
  * warm once, then run 3 timed noop materializations counting Spark jobs,
  * stages and tasks via a listener — the fixed-overhead attribution the
  * sf0.1 battery times are made of. With SPARK_GRAFT_PLAN_OUT set, also
  * writes `<name>_before.txt` explain("formatted") dumps there. */
object ProbeQueryJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val codegenCache = sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", codegenCache)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })

    val only = if (args.nonEmpty) Some(args.toSet) else None
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val planOut = sys.env.get("SPARK_GRAFT_PLAN_OUT")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "_before")

    println(f"${"query"}%-28s ${"min_s"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%7s")
    qs.foreach { case (name, fn) =>
      def mat(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      try {
        mat() // warm
        planOut.foreach { dir =>
          val pl = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/$name$suffix.txt"),
            pl.getBytes("UTF-8"))
        }
        val runs = (0 until 3).map { _ =>
          jobs = 0; stages = 0; tasks = 0L
          val t0 = System.nanoTime()
          mat()
          ((System.nanoTime() - t0) / 1e9, jobs, stages, tasks)
        }
        val best = runs.minBy(_._1)
        println(f"$name%-28s ${best._1}%8.3f ${best._2}%5d ${best._3}%7d ${best._4}%7d")
      } catch { case e: Throwable =>
        println(s"$name ERROR ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    spark.stop()
  }
}
