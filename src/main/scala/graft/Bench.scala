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
  * Ordering contract (round-9 reproducibility fix): the SERVING-TIER
  * loops (ingest, cold/cached qps, rollup routing, ANALYZE tiers,
  * streaming ingest) run FIRST, in the fresh forked JVM, before the
  * battery — two rounds of driver artifacts showed the serving numbers
  * swinging up to 3.3× on identical code when they ran in the battery's
  * JIT/GC wake (the battery medians were stable; the qps loops were
  * not). The reference's perf clients are standalone processes for the
  * same reason (`cmd/perf-client/main.go`). Every serving loop is now
  * also measured as the MEDIAN OF 3 PASSES with the raw per-pass qps
  * recorded in `serving_runs`, so residual variance is visible in the
  * artifact instead of silently poisoning the headline number.
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

  private def esc(e: Throwable): String =
    e.getClass.getSimpleName + ": " +
      String.valueOf(e.getMessage).replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Pre-warm the OS page cache over the source parquet: cross-run
    // serving variance was traced to cold files, not the engine (SCALE.md
    // round-9 protocol note) — one sequential read makes runs comparable.
    try {
      val buf = new Array[Byte](1 << 20)
      Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .foreach { f =>
          val in = new java.io.FileInputStream(f)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
    } catch { case _: Throwable => () }
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
      try f catch { case e: Throwable => errors.getOrElseUpdate(name, esc(e)) }

    // ------------------------------------------------------------------
    // Serving tier FIRST (see ordering contract above). Per-pass qps of
    // every loop lands in `serving_runs`.
    // ------------------------------------------------------------------
    val servingRuns =
      scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    /** Median-of-3-passes throughput: each pass runs `n` iterations of
      * `body` with a globally unique iteration index (pass·n + k), so
      * cold paths stay cold across passes (no accidental result-cache
      * hits); records per-pass qps under `key`. */
    def passes3(key: String, n: Int)(body: Int => Unit): Double = {
      val qps = (0 until 3).map { p =>
        val t0 = System.nanoTime()
        var k = 0
        while (k < n) { body(p * n + k); k += 1 }
        n / ((System.nanoTime() - t0) / 1e9)
      }
      servingRuns(key) = qps
      qps.sorted.apply(1)
    }

    val tmp = java.nio.file.Files.createTempDirectory("graft_bench").toString
    val skipServing = sys.env.get("SPARK_GRAFT_SKIP_SERVING").contains("1")
    // A serving-tier failure must degrade to zeros + an `errors` entry —
    // never abort the run: the driver's JSON line is the round's only
    // bench record.
    val (ingestRps, qpsCold, qpsCached, qpsDsRaw, qpsDsRollup,
      qpsGbtRaw, qpsGbtRouted, qpsAnalyzeCold, qpsAnalyzeCached,
      qpsCorrRaw, qpsCorrRouted, qpsDeltaRaw, qpsDeltaRouted, qpsDeltaLocal,
      qpsIrateLocal, qpsDeltaByRaw, qpsDeltaByRouted, qpsTwaRaw, qpsTwaRouted,
      qpsResetsRaw, qpsResetsRouted, qpsResetsByLocal) =
      if (skipServing)
        (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
         0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
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
      val ingestRaw = (0 until 3).map { k =>
        val eng = new graft.tsdb.TsdbEngine(spark, s"$tmp/db$k")
        val t0 = System.nanoTime()
        eng.putDF(pts)
        nRows / ((System.nanoTime() - t0) / 1e9)
      }
      servingRuns("ingest_rows_per_sec") = ingestRaw
      val ingestRps0 = ingestRaw.sorted.apply(1)
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
      // 20-query sample landed), so warm well past it, then take the
      // median of 3 passes of 100.
      (1000 until 1400).foreach(i => engine.queryCached(q(i)))
      val qpsCold0 = passes3("query_qps_cold", 100)(i => { engine.queryCached(q(i)); () })
      // cached = repeated identical query (result-cache hit path): ~1 µs
      // steady-state, so small samples measured ONLY keyOf's JIT warmup
      val cq = q(0)
      (0 until 5000).foreach(_ => engine.queryCached(cq))
      val qpsCached0 = passes3("query_qps_cached", 20000)(_ => { engine.queryCached(cq); () })

      // rollup acceleration: the CACHED SERVING-PATH read (build excluded
      // — the battery's tsdb_rollup_downsample measures build+query; this
      // is the number the epoch-keyed materialization actually serves).
      // Same downsample shapes raw-vs-routed; every query distinct so the
      // result cache never answers. Granularity must sit at or above the
      // point density scale to compress (here: daily windows over the
      // whole range — |series| × days rollup rows vs every raw point).
      val DayNs = graft.tsdb.TsdbEngine.DayNs
      // (i%3, i%2, i%23) triples are distinct for indices distinct mod
      // 138 — every measured query is a result-cache MISS by params as
      // long as one loop's global indices stay inside a stride
      def dq(i: Int) = graft.tsdb.QueryParams("purchase",
        startNs = 1704067200000000000L + (math.abs(i) % 3).toLong * DayNs,
        endNs = Some(1704067200000000000L +
          ((math.abs(i) % 3) + 20 + (math.abs(i) % 23)).toLong * DayNs - 1),
        downsampleNs = Some((1L + (math.abs(i) % 2)) * DayNs),
        aggs = Seq(graft.tsdb.AggSpec("avg", "value"),
          graft.tsdb.AggSpec("sum", "value"), graft.tsdb.AggSpec("count", "*"),
          graft.tsdb.AggSpec("min", "value"), graft.tsdb.AggSpec("max", "value")))
      // index budget (params repeat only at stride 138, and queryCached
      // caches results by params — a colliding index would hit the
      // result cache mid-measurement): warm view 130, raw measured
      // 0..29, routed warm 120..123, routed measured 30..119 — all
      // distinct mod 138, all sets disjoint
      engine.queryCached(dq(130)) // warm the merged serving view
      val qpsDsRaw0 = passes3("qps_downsample_raw", 10)(i => { engine.queryCached(dq(i)); () })
      engine.registerRollup("purchase", DayNs, Seq("value"))
      // routed queries serve from the DRIVER-RESIDENT rollup tier
      // (LocalRollup): materialize + collect once (excluded), warm the
      // re-agg JIT, then measure — the path is sub-ms
      (120 until 124).foreach(i => engine.queryCached(dq(i)))
      val qpsDsR0 = passes3("qps_downsample_rollup", 30)(i => { engine.queryCached(dq(30 + i)); () })
      // tag-grouped serving: the same downsample shapes collapsed across
      // series (GROUP BY TAGS ()) through the driver partial tier vs the
      // raw Spark operator
      def gq(i: Int) = dq(i)
      val pts0 = engine.loadPoints().get
      graft.tsdb.TsAnalytics.aggregateByTags(pts0, gq(200), Nil).count() // warm raw path
      val qpsGbtRaw0 = passes3("qps_groupby_raw", 5) { i =>
        val pts = engine.loadPoints().get
        graft.tsdb.TsAnalytics.aggregateByTags(pts, gq(200 + i), Nil).count(); ()
      }
      (250 until 254).foreach(i => engine.queryByTagsServingDF(gq(i), Nil).count())
      val qpsGbtR0 = passes3("qps_groupby_rollup", 30)(i =>
        { engine.queryByTagsServingDF(gq(300 + i), Nil).count(); () })
      // ANALYZE serving tier: cold = distinct rate queries (full Spark
      // plan each, namespaced-cache misses), cached = one repeated query
      // (the dashboard-refresh path the analyze cache exists for)
      def aq(i: Int) = graft.tsdb.QueryParams("purchase",
        startNs = 1704067200000000000L + (i % 5).toLong * DayNs,
        endNs = Some(1704067200000000000L + (25 + (i % 7)).toLong * DayNs))
      val rateSpec = graft.tsdb.AnalyzeRate("value")
      engine.analyzeServingDF(aq(100), rateSpec).count() // warm codegen
      val qpsAnCold0 = passes3("qps_analyze_cold", 5)(i =>
        { engine.analyzeServingDF(aq(i), rateSpec).count(); () })
      // cached = the driver-side rows path (queryCached analog) — the
      // hit path has no per-call plan/DataFrame floor
      val caq = aq(0)
      (0 until 500).foreach(_ => engine.analyzeCached(caq, rateSpec))
      val qpsAnCached0 = passes3("qps_analyze_cached", 5000)(_ =>
        { engine.analyzeCached(caq, rateSpec); () })
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
      val qpsCorrRaw0 = passes3("qps_correlate_raw", 3)(i =>
        { engine.analyze(cp, corq(i)).count(); () })
      engine.registerRollup("purchase", DayNs, Seq("value"))
      engine.registerRollup("view", DayNs, Seq("value"))
      engine.analyze(cp, corq(0)).count() // materialize both rollup views
      val qpsCorrR0 = passes3("qps_correlate_rollup", 10)(i =>
        { engine.analyze(cp, corq(i)).count(); () })

      // ANALYZE DELTA: raw lag-scan vs rollup-partial route (purchase@1d
      // is registered above, so the routed pass reads |series|×windows
      // partial rows; distinct TAGGED filters defeat any caching)
      def dlq(i: Int) = cp.copy(tags =
        if (i % 2 == 0) Map.empty[String, String] else Map("user" -> s"${i % 7}"))
      val deltaSpec = graft.tsdb.AnalyzeDelta("value")
      engine.dropRollup("purchase")
      engine.analyze(dlq(0), deltaSpec).count() // warm the raw plan
      val qpsDeltaRaw0 = passes3("qps_delta_raw", 3)(i =>
        { engine.analyze(dlq(i), deltaSpec).count(); () })
      engine.registerRollup("purchase", DayNs, Seq("value"))
      engine.analyze(dlq(0), deltaSpec).count() // materialize the view
      val qpsDeltaR0 = passes3("qps_delta_rollup", 10)(i =>
        { engine.analyze(dlq(i), deltaSpec).count(); () })

      // windowed DELTA BY: raw lag-scan vs the per-window partial route
      // (same registered purchase@1d rollup; the target window is a
      // multiple of the grain so the decomposition is exact)
      val deltaBySpec = graft.tsdb.AnalyzeDeltaBy("value", 2L * DayNs)
      engine.dropRollup("purchase")
      engine.analyze(dlq(0), deltaBySpec).count() // warm the raw plan
      val qpsDeltaByRaw0 = passes3("qps_delta_by_raw", 3)(i =>
        { engine.analyze(dlq(i), deltaBySpec).count(); () })
      engine.registerRollup("purchase", DayNs, Seq("value"))
      engine.analyze(dlq(0), deltaBySpec).count() // materialize the view
      val qpsDeltaByR0 = passes3("qps_delta_by_rollup", 10)(i =>
        { engine.analyze(dlq(i), deltaBySpec).count(); () })

      // TWA: raw LOCF integral vs the rollup-partial route (`__area`
      // integrals + boundary carry from the ord structs)
      val twaSpec = graft.tsdb.AnalyzeTwa("value", DayNs)
      engine.dropRollup("purchase")
      engine.analyze(dlq(0), twaSpec).count() // warm the raw plan
      val qpsTwaRaw0 = passes3("qps_twa_raw", 3)(i =>
        { engine.analyze(dlq(i), twaSpec).count(); () })
      engine.registerRollup("purchase", DayNs, Seq("value"))
      engine.analyze(dlq(0), twaSpec).count() // materialize the view
      val qpsTwaR0 = passes3("qps_twa_rollup", 10)(i =>
        { engine.analyze(dlq(i), twaSpec).count(); () })

      // driver-resident DELTA tier: pure-Scala fold over resident
      // partials, no Spark job — distinct TAGGED filters defeat the
      // result cache so each call pays the full local fold
      engine.analyzeCached(dlq(1), deltaSpec) // make partials resident
      val qpsDeltaL0 = passes3("qps_delta_local", 300)(i =>
        { engine.analyzeCached(dlq(1).copy(tags = Map("user" -> s"u$i")),
            deltaSpec); () })
      // driver-resident IRATE tier: last-two-samples fold over the same
      // resident partials (LocalRollup.runIrate), no Spark job
      val irateSpec = graft.tsdb.AnalyzeIrate("value")
      engine.analyzeCached(dlq(1), irateSpec)
      val qpsIrateL0 = passes3("qps_irate_local", 300)(i =>
        { engine.analyzeCached(dlq(1).copy(tags = Map("user" -> s"u$i")),
            irateSpec); () })

      // counter transitions (RESETS): raw lag-scan vs the long-count
      // partial route — the r9 family; the routed read is BIT-identical
      val resetsSpec = graft.tsdb.AnalyzeResets("value")
      engine.dropRollup("purchase")
      engine.analyze(dlq(0), resetsSpec).count() // warm the raw plan
      val qpsResetsRaw0 = passes3("qps_resets_raw", 3)(i =>
        { engine.analyze(dlq(i), resetsSpec).count(); () })
      engine.registerRollup("purchase", DayNs, Seq("value"))
      engine.analyze(dlq(0), resetsSpec).count() // materialize the view
      val qpsResetsR0 = passes3("qps_resets_rollup", 10)(i =>
        { engine.analyze(dlq(i), resetsSpec).count(); () })
      // driver-resident windowed tier: RESETS BY folded from resident
      // partials, no Spark job
      val resetsBySpec = graft.tsdb.AnalyzeResetsBy("value", 2L * DayNs)
      engine.analyzeCached(dlq(1), resetsBySpec)
      val qpsResetsByL0 = passes3("qps_resets_by_local", 300)(i =>
        { engine.analyzeCached(dlq(1).copy(tags = Map("user" -> s"u$i")),
            resetsBySpec); () })

      (ingestRps0, qpsCold0, qpsCached0, qpsDsRaw0, qpsDsR0,
        qpsGbtRaw0, qpsGbtR0, qpsAnCold0, qpsAnCached0,
        qpsCorrRaw0, qpsCorrR0, qpsDeltaRaw0, qpsDeltaR0, qpsDeltaL0,
        qpsIrateL0, qpsDeltaByRaw0, qpsDeltaByR0, qpsTwaRaw0, qpsTwaR0,
        qpsResetsRaw0, qpsResetsR0, qpsResetsByL0)
    } catch { case e: Throwable =>
      errors.getOrElseUpdate("serving_tier", esc(e))
      (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
       0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp)); ()
    }

    // Streaming ingest scale point: rows/s through the REAL structured-
    // streaming path (json parse → validate → seq-stamp → foreachBatch →
    // exactly-once commit), several micro-batches via maxFilesPerTrigger.
    // Measured wall-clock from stream start to processAllAvailable — the
    // checkpoint + txn-watermark overhead is part of the number; that is
    // the point (regressions in the commit path must move this metric).
    // Runs inside the serving-first block (before the battery) for the
    // same reproducibility contract.
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
        errors.getOrElseUpdate("ingest_stream", esc(e))
        0.0
      }

    // ------------------------------------------------------------------
    // Battery (after the serving tier; its own warmup pass below).
    // ------------------------------------------------------------------
    spark.sharedState.cacheManager.clearCache()
    System.gc()
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
    val totalCount = resultsCount.map(_._2).sum

    val servingRunsJson = servingRuns.map { case (k, ts) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
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
      s""""qps_delta_by_raw":$qpsDeltaByRaw,"qps_delta_by_rollup":$qpsDeltaByRouted,""" +
      s""""qps_twa_raw":$qpsTwaRaw,"qps_twa_rollup":$qpsTwaRouted,""" +
      s""""qps_delta_local":$qpsDeltaLocal,"qps_irate_local":$qpsIrateLocal,""" +
      s""""qps_resets_raw":$qpsResetsRaw,"qps_resets_rollup":$qpsResetsRouted,""" +
      s""""qps_resets_by_local":$qpsResetsByLocal,""" +
      s""""serving_runs":$servingRunsJson,""" +
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
