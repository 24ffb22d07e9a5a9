package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Perf harness (driver contract: ONE JSON line on stdout).
  * Mirrors the reference's measurement shape (`cmd/perf-client/main.go`,
  * `engine2/bench_perf001_test.go`): a warmup pass excluded from
  * measurement, then three timed passes per query (interleaved round-robin
  * so a transient stall can't poison one query's every sample), reporting
  * the per-query MEDIAN, P50/P90/P99 across query medians. `value` = total
  * of per-query medians across the battery; `runs` carries the raw samples
  * so spread is visible.
  *
  * Queries are timed to FULL MATERIALIZATION (noop-format write, which
  * evaluates every output row and column) — `count()` would let Catalyst
  * prune projection work and understate serving cost. Ingest is timed
  * steady-state: the write path is exercised once on a small slice first
  * (codegen + committer warmup), then the full load is measured, matching
  * the reference protocol's warmup-then-measure shape. */
object Bench {

  /** Materialize every row/column of `df` (no driver transfer). */
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_ONLY=a,b,c restricts the run (targeted scale
    // measurements; also keeps one JVM's broadcast/cleaner backlog
    // bounded when measuring the heavy families at big SFs)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // A query that throws must SURFACE as an error, never bench as a
    // ~0-second win: first failure message per query is recorded and
    // reported in the JSON (`errors`/`n_errors`).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def run(name: String, f: => Unit): Unit =
      try f catch { case e: Throwable =>
        errors.getOrElseUpdate(name,
          e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
      }
    // warmup: codegen + JIT + page cache, excluded from measurement
    qs.foreach { case (name, fn) => run(name, materialize(fn(spark, sfDir))) }
    // 3 measured passes, interleaved (pass 1 of every query, then pass 2,
    // then pass 3): a transient CPU stall lands in at most one sample per
    // query, and the per-query median discards it.
    val nPasses = 3
    val samples: Seq[Seq[(String, Double)]] = (0 until nPasses).map { _ =>
      qs.map { case (name, fn) =>
        val t0 = System.nanoTime()
        run(name, materialize(fn(spark, sfDir)))
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val byQuery: Seq[(String, Seq[Double])] =
      qs.map { case (name, _) => name -> samples.map(_.toMap.apply(name)) }
    val results = byQuery.map { case (name, ts) => name -> median(ts) }
    // count()-mode pass: Catalyst prunes result projections, so this
    // UNDERSTATES serving cost — reported only for apples-to-apples
    // comparison with rounds benched before the materialization fix.
    val resultsCount = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      run(name, { fn(spark, sfDir).count(); () })
      name -> (System.nanoTime() - t0) / 1e9
    }
    val lat = results.map(_._2).sorted
    def pct(p: Double): Double =
      if (lat.isEmpty) 0.0 else lat(math.min(lat.size - 1, (p * lat.size).toInt))
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val runsJson = byQuery.map { case (k, ts) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // Reference-protocol throughput (cmd/perf-client + query-perf-client
    // shapes): bulk ingest points/sec into a fresh engine, then repeated
    // tag-equality range queries — cold (full Spark plan per query) and
    // cached (the serving path a dashboard hits).
    // The battery's operators persist slim intermediates and rely on the
    // ContextCleaner to free them when unreachable — correct, but lazily
    // timed: by this point the block manager still holds whatever the
    // cleaner hasn't gotten to, which taxes the serving measurements
    // below (ingest measured 13k rows/s dirty vs ~50k clean at sf0.1).
    // Clear explicitly so the serving block measures the serving tier,
    // not battery residue.
    spark.sharedState.cacheManager.clearCache()
    System.gc()

    val tmp = java.nio.file.Files.createTempDirectory("graft_bench").toString
    val skipServing = sys.env.get("SPARK_GRAFT_SKIP_SERVING").contains("1")
    // A serving-tier failure must degrade to zeros + an `errors` entry —
    // never abort the run: the battery numbers above are already paid
    // for, and the driver's JSON line is the round's only bench record.
    val (ingestRps, qpsCold, qpsCached, qpsDsRaw, qpsDsRollup,
      qpsGbtRaw, qpsGbtRouted, qpsAnalyzeCold, qpsAnalyzeCached,
      qpsCorrRaw, qpsCorrRouted, qpsDeltaRaw, qpsDeltaRouted, qpsDeltaLocal) =
      if (skipServing) (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      else try {
      val pts = graft.tsdb.Tables.eventsAsPoints(spark, sfDir).cache()
      val nRows = pts.count()
      // steady-state: warm the write path (codegen, parquet committer,
      // log machinery) on a throwaway engine, then time the real load as
      // the MEDIAN of 3 fresh-engine loads (single-shot ingest was the
      // highest-variance number across rounds: r4 73.3k vs r6 65.2k on
      // identical code — the round-7 probe attributed the spread to
      // JIT/GC phase, not the write path)
      new graft.tsdb.TsdbEngine(spark, s"$tmp/warm").putDF(pts.limit(1000))
      val ingestSecs = (0 until 3).map { k =>
        val eng = new graft.tsdb.TsdbEngine(spark, s"$tmp/db$k")
        val t0 = System.nanoTime()
        eng.putDF(pts)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val ingestSec = ingestSecs(1)
      val engine = new graft.tsdb.TsdbEngine(spark, s"$tmp/db0")
      pts.unpersist()
      val rnd = new scala.util.Random(42)
      def q(i: Int) = graft.tsdb.QueryParams("purchase",
        Map("user" -> (rnd.nextInt(100).toString)),
        startNs = 1704067200000000000L + i * 3600000000000L,
        endNs = Some(1704067200000000000L + (i + 24) * 3600000000000L))
      // cold = uncached RESULT on the serving path (every query distinct →
      // all result-cache misses). Warmup-then-measure like every other
      // block: the round-7 probe showed the first ~100 calls sit in the
      // JIT transient (444 qps warming → 600+ steady on identical code —
      // the whole r4→r6 "regression" was where inside that transient the
      // 20-query sample landed), so warm past it and measure 100.
      val nCold = 100
      (1000 until 1300).foreach(i => engine.queryCached(q(i)))
      val t1 = System.nanoTime()
      (0 until nCold).foreach(i => engine.queryCached(q(i)))
      val coldSec = (System.nanoTime() - t1) / 1e9
      // cached = repeated identical query (result-cache hit path): ~1 µs
      // steady-state, so 200 samples measured ONLY keyOf's JIT warmup
      val nCached = 20000
      val cq = q(0)
      (0 until 5000).foreach(_ => engine.queryCached(cq))
      val t2 = System.nanoTime()
      (0 until nCached).foreach(_ => engine.queryCached(cq))
      val cachedSec = (System.nanoTime() - t2) / 1e9

      // rollup acceleration: the CACHED SERVING-PATH read (build excluded
      // — the battery's tsdb_rollup_downsample measures build+query; this
      // is the number the epoch-keyed materialization actually serves).
      // Same downsample shapes raw-vs-routed; every query distinct so the
      // result cache never answers. Granularity must sit at or above the
      // point density scale to compress (here: daily windows over the
      // whole range — |series| × days rollup rows vs every raw point).
      val DayNs = graft.tsdb.TsdbEngine.DayNs
      // (i%3, i%2, i%23) triples are distinct for indices distinct mod
      // 138 — every measured query is a result-cache MISS by params
      def dq(i: Int) = graft.tsdb.QueryParams("purchase",
        startNs = 1704067200000000000L + (math.abs(i) % 3).toLong * DayNs,
        endNs = Some(1704067200000000000L +
          ((math.abs(i) % 3) + 20 + (math.abs(i) % 23)).toLong * DayNs - 1),
        downsampleNs = Some((1L + (math.abs(i) % 2)) * DayNs),
        aggs = Seq(graft.tsdb.AggSpec("avg", "value"),
          graft.tsdb.AggSpec("sum", "value"), graft.tsdb.AggSpec("count", "*"),
          graft.tsdb.AggSpec("min", "value"), graft.tsdb.AggSpec("max", "value")))
      val nDs = 10
      // warm indices chosen OUTSIDE the measured sets (params repeat only
      // at stride 138) — a colliding warm query would hit the result
      // cache and the excluded build would land inside the measured pass
      engine.queryCached(dq(55)) // warm the merged serving view
      val t3 = System.nanoTime()
      (0 until nDs).foreach(i => engine.queryCached(dq(i)))
      val rawDsSec = (System.nanoTime() - t3) / 1e9
      engine.registerRollup("purchase", DayNs, Seq("value"))
      // routed queries serve from the DRIVER-RESIDENT rollup tier
      // (LocalRollup): materialize + collect once (excluded), warm the
      // re-agg JIT, then measure more iterations — the path is sub-ms
      val nDsR = 30
      (56 until 60).foreach(i => engine.queryCached(dq(i)))
      val t4 = System.nanoTime()
      (0 until nDsR).foreach(i => engine.queryCached(dq(100 + i)))
      val routedDsSec = (System.nanoTime() - t4) / 1e9
      // tag-grouped serving: the same downsample shapes collapsed across
      // series (GROUP BY TAGS ()) through the driver partial tier vs the
      // raw Spark operator
      def gq(i: Int) = dq(i)
      val pts0 = engine.loadPoints().get
      graft.tsdb.TsAnalytics.aggregateByTags(pts0, gq(200), Nil).count() // warm raw path
      val nGbtRaw = 5
      val t5 = System.nanoTime()
      (0 until nGbtRaw).foreach { i =>
        val pts = engine.loadPoints().get
        graft.tsdb.TsAnalytics.aggregateByTags(pts, gq(200 + i), Nil).count()
      }
      val gbtRawSec = (System.nanoTime() - t5) / 1e9
      (250 until 254).foreach(i => engine.queryByTagsServingDF(gq(i), Nil).count())
      val nGbtR = 30
      val t6 = System.nanoTime()
      (0 until nGbtR).foreach(i =>
        engine.queryByTagsServingDF(gq(300 + i), Nil).count())
      val gbtRoutedSec = (System.nanoTime() - t6) / 1e9
      // ANALYZE serving tier: cold = distinct rate queries (full Spark
      // plan each, namespaced-cache misses), cached = one repeated query
      // (the dashboard-refresh path the analyze cache exists for)
      def aq(i: Int) = graft.tsdb.QueryParams("purchase",
        startNs = 1704067200000000000L + (i % 5).toLong * DayNs,
        endNs = Some(1704067200000000000L + (25 + (i % 7)).toLong * DayNs))
      val rateSpec = graft.tsdb.AnalyzeRate("value")
      engine.analyzeServingDF(aq(100), rateSpec).count() // warm codegen
      val nAnCold = 5
      val t7 = System.nanoTime()
      (0 until nAnCold).foreach(i => engine.analyzeServingDF(aq(i), rateSpec).count())
      val anColdSec = (System.nanoTime() - t7) / 1e9
      // cached = the driver-side rows path (queryCached analog) — the
      // hit path has no per-call plan/DataFrame floor
      val caq = aq(0)
      (0 until 500).foreach(_ => engine.analyzeCached(caq, rateSpec))
      val nAnCached = 5000
      val t8 = System.nanoTime()
      (0 until nAnCached).foreach(_ => engine.analyzeCached(caq, rateSpec))
      val anCachedSec = (System.nanoTime() - t8) / 1e9
      // cross-metric analytics: CORRELATE from the raw point scan vs the
      // rollup-partial route (points never scanned). engine.analyze is
      // the raw plan entry (no result cache), so each call measures the
      // PLAN path being compared; the downsample block above already
      // registered purchase@1d, view stays unregistered until the routed
      // pass so the first measurement is genuinely the point path.
      def corq(i: Int) = graft.tsdb.AnalyzeCorrelate("value", "view", "user",
        DayNs, 2 + (i % 5))
      val cp = graft.tsdb.QueryParams("purchase",
        startNs = 1704067200000000000L,
        endNs = Some(1704067200000000000L + 30L * DayNs - 1))
      engine.analyze(cp, corq(0)).count() // warm
      val nCorrRaw = 3
      val t9 = System.nanoTime()
      (0 until nCorrRaw).foreach(i => engine.analyze(cp, corq(i)).count())
      val corrRawSec = (System.nanoTime() - t9) / 1e9
      engine.registerRollup("purchase", DayNs, Seq("value"))
      engine.registerRollup("view", DayNs, Seq("value"))
      engine.analyze(cp, corq(0)).count() // materialize both rollup views
      val nCorrR = 10
      val t10 = System.nanoTime()
      (0 until nCorrR).foreach(i => engine.analyze(cp, corq(i)).count())
      val corrRoutedSec = (System.nanoTime() - t10) / 1e9

      // ANALYZE DELTA: raw lag-scan vs rollup-partial route (purchase@1d
      // is registered above, so the routed pass reads |series|×windows
      // partial rows; distinct TAGGED filters defeat any caching)
      def dlq(i: Int) = cp.copy(tags =
        if (i % 2 == 0) Map.empty[String, String] else Map("user" -> s"${i % 7}"))
      val deltaSpec = graft.tsdb.AnalyzeDelta("value")
      engine.dropRollup("purchase")
      engine.analyze(dlq(0), deltaSpec).count() // warm the raw plan
      val nDeltaRaw = 3
      val t11 = System.nanoTime()
      (0 until nDeltaRaw).foreach(i => engine.analyze(dlq(i), deltaSpec).count())
      val deltaRawSec = (System.nanoTime() - t11) / 1e9
      engine.registerRollup("purchase", DayNs, Seq("value"))
      engine.analyze(dlq(0), deltaSpec).count() // materialize the view
      val nDeltaR = 10
      val t12 = System.nanoTime()
      (0 until nDeltaR).foreach(i => engine.analyze(dlq(i), deltaSpec).count())
      val deltaRoutedSec = (System.nanoTime() - t12) / 1e9

      // driver-resident DELTA tier: pure-Scala fold over resident
      // partials, no Spark job — distinct TAGGED filters defeat the
      // result cache so each call pays the full local fold
      engine.analyzeCached(dlq(1), deltaSpec) // make partials resident
      val nDeltaL = 300
      val t13 = System.nanoTime()
      (0 until nDeltaL).foreach(i =>
        engine.analyzeCached(dlq(1).copy(tags = Map("user" -> s"u$i")), deltaSpec))
      val deltaLocalSec = (System.nanoTime() - t13) / 1e9

      (nRows / ingestSec, nCold / coldSec, nCached / cachedSec,
        nDs / rawDsSec, nDsR / routedDsSec,
        nGbtRaw / gbtRawSec, nGbtR / gbtRoutedSec,
        nAnCold / anColdSec, nAnCached / anCachedSec,
        nCorrRaw / corrRawSec, nCorrR / corrRoutedSec,
        nDeltaRaw / deltaRawSec, nDeltaR / deltaRoutedSec,
        nDeltaL / deltaLocalSec)
    } catch { case e: Throwable =>
      errors.getOrElseUpdate("serving_tier",
        e.getClass.getSimpleName + ": " +
          String.valueOf(e.getMessage).replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
      (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp)); ()
    }

    // Streaming ingest scale point: rows/s through the REAL structured-
    // streaming path (json parse → validate → seq-stamp → foreachBatch →
    // exactly-once commit), several micro-batches via maxFilesPerTrigger.
    // Measured wall-clock from stream start to processAllAvailable — the
    // checkpoint + txn-watermark overhead is part of the number; that is
    // the point (regressions in the commit path must move this metric).
    val ingestStreamRps: Double =
      if (skipServing) 0.0 else try {
        val stmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
        try {
          val pts = graft.tsdb.Tables.eventsAsPoints(spark, sfDir)
          val nRows = pts.count()
          pts.drop("seq").toJSON.toDF("value")
            .repartition(8).write.text(s"$stmp/in")
          val engine = new graft.tsdb.TsdbEngine(spark, s"$stmp/db")
          val src = spark.readStream
            .option("maxFilesPerTrigger", "2") // ≥4 micro-batches
            .text(s"$stmp/in")
          val t0 = System.nanoTime()
          val q = graft.streaming.Ingest.start(engine, src, s"$stmp/ckpt")
          q.processAllAvailable()
          q.stop()
          nRows / ((System.nanoTime() - t0) / 1e9)
        } finally {
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stmp)); ()
        }
      } catch { case e: Throwable =>
        errors.getOrElseUpdate("ingest_stream",
          e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
        0.0
      }

    val totalCount = resultsCount.map(_._2).sum

    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,""" +
      s""""runs":$runsJson,"passes":$nPasses,""" +
      s""""total_count_mode":$totalCount,""" +
      s""""p50":${pct(0.5)},"p90":${pct(0.9)},"p99":${pct(0.99)},""" +
      s""""ingest_rows_per_sec":$ingestRps,""" +
      s""""ingest_stream_rows_per_sec":$ingestStreamRps,""" +
      s""""query_qps_cold":$qpsCold,""" +
      s""""query_qps_cached":$qpsCached,""" +
      s""""qps_downsample_raw":$qpsDsRaw,"qps_downsample_rollup":$qpsDsRollup,""" +
      s""""qps_groupby_raw":$qpsGbtRaw,"qps_groupby_rollup":$qpsGbtRouted,""" +
      s""""qps_analyze_cold":$qpsAnalyzeCold,"qps_analyze_cached":$qpsAnalyzeCached,""" +
      s""""qps_correlate_raw":$qpsCorrRaw,"qps_correlate_rollup":$qpsCorrRouted,""" +
      s""""qps_delta_raw":$qpsDeltaRaw,"qps_delta_rollup":$qpsDeltaRouted,""" +
      s""""qps_delta_local":$qpsDeltaLocal,""" +
      s""""n_errors":${errors.size},"errors":$errJson,""" +
      s""""n_queries":${results.size},"sf":"$sfDir"}"""
    println(line)
    // The driver archives only a short tail of stdout per round, which
    // loses the per-query arrays for large batteries — persist the FULL
    // record as a repo artifact too (committed per round as
    // bench_r<N>_full.json).
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full_latest.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // stdout line already carries the record
    spark.stop()
  }
}
