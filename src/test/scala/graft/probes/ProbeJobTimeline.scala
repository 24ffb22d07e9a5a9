package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** r17: per-job wall time + inter-job driver gaps for one query — is the
  * residual fixed cost in the jobs (tasks/shuffle) or between them
  * (planning/AQE/codegen on the driver)? */
object ProbeJobTimeline {
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

    val events = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = Option(starts.get(j.jobId)).getOrElse(j.time)
        events.synchronized { events += (("job" + j.jobId, s, j.time)) }
      }
    })

    val name = if (args.nonEmpty) args(0) else "tsdb_rollup_downsample"
    val fn = SparkEntry.queries(name)
    def mat(): Unit = fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    mat(); mat() // warm
    Thread.sleep(500)
    events.synchronized(events.clear())
    val t0 = System.currentTimeMillis()
    mat()
    val t1 = System.currentTimeMillis()
    Thread.sleep(300)
    val evs = events.synchronized(events.toSeq.sortBy(_._2))
    println(s"[timeline] $name total=${t1 - t0} ms")
    var prevEnd = t0
    var jobMs = 0L; var gapMs = 0L
    evs.foreach { case (id, s, e) =>
      val gap = s - prevEnd
      println(f"[timeline]   $id%-8s start+${s - t0}%5d gap=$gap%5d dur=${e - s}%5d")
      jobMs += (e - s); gapMs += math.max(0, gap)
      prevEnd = math.max(prevEnd, e)
    }
    println(f"[timeline] jobs=${evs.size} jobMs=$jobMs gapMs=$gapMs tail=${t1 - prevEnd}")
    spark.stop()
  }
}
