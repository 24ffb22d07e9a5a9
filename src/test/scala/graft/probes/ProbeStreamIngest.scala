package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: stage-time the STRUCTURED-STREAMING ingest path exactly as
  * Bench measures it (json text source, maxFilesPerTrigger=2, foreachBatch
  * → exactly-once commit), attributing wall-clock to: the engine's three
  * commit stages ([[graft.tsdb.TsdbEngine.appendStageNs]]), the
  * foreachBatch body outside the engine, and the streaming framework
  * (trigger scheduling, checkpoint/offset writes) — VERDICT r12 agenda #1:
  * measure before touching. */
object ProbeStreamIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sip").toString
    try {
      val pts = graft.tsdb.Tables.eventsAsPoints(spark, sfDir)
      val nRows = pts.count()
      pts.drop("seq").toJSON.toDF("value")
        .repartition(8).write.text(s"$tmp/in")
      println(s"rows=$nRows files=8")
      val passes = args.headOption.map(_.toInt).getOrElse(3)
      (0 until passes).foreach { pass =>
        val engine = new graft.tsdb.TsdbEngine(spark, s"$tmp/db$pass")
        var batchWallNs = 0L
        var nBatches = 0
        val src = spark.readStream
          .option("maxFilesPerTrigger", "2")
          .text(s"$tmp/in")
        val t0 = System.nanoTime()
        // inline copy of Ingest.start's body with a wall-clock around it
        val q = src.writeStream
          .option("checkpointLocation", s"$tmp/ckpt$pass")
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            val b0 = System.nanoTime()
            val p = graft.streaming.Ingest.parse(batch)
              .filter(!org.apache.spark.sql.functions.col("_rejected"))
              .drop("_rejected")
              .withColumn("tags", org.apache.spark.sql.functions.coalesce(
                org.apache.spark.sql.functions.col("tags"),
                org.apache.spark.sql.functions.map()))
            val base = engine.reserveSeqBlock()
            engine.putDF(p.withColumn("seq",
              org.apache.spark.sql.functions.lit(base) +
                org.apache.spark.sql.functions.monotonically_increasing_id()),
              txn = Some((s"probe$pass", batchId)))
            batchWallNs += System.nanoTime() - b0
            nBatches += 1
          }
          .start()
        q.processAllAvailable()
        q.stop()
        val total = (System.nanoTime() - t0) / 1e9
        val stages = (0 until 3).map(engine.appendStageNs.get(_) / 1e9)
        println(f"pass=$pass total=$total%.2f s rows/s=${nRows / total}%.0f " +
          f"batches=$nBatches batchWall=${batchWallNs / 1e9}%.2f")
        println(f"  stagingWrite(parse+shuffle+parquet)=${stages(0)}%.2f " +
          f"moveIn=${stages(1)}%.2f logCommit+invalidate=${stages(2)}%.2f " +
          f"foreachBatchOther=${batchWallNs / 1e9 - stages.sum}%.2f " +
          f"framework=${total - batchWallNs / 1e9}%.2f")
      }
      // reference points: same rows through the BULK path, single commit
      val engineB = new graft.tsdb.TsdbEngine(spark, s"$tmp/bulk")
      val tb = System.nanoTime()
      engineB.putDF(pts)
      val bulk = (System.nanoTime() - tb) / 1e9
      println(f"bulk putDF: $bulk%.2f s rows/s=${nRows / bulk}%.0f " +
        (0 until 3).map(engineB.appendStageNs.get(_) / 1e9)
          .map(s => f"$s%.2f").mkString("stages=[", ", ", "]"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp)); ()
    }
    spark.stop()
  }
}
