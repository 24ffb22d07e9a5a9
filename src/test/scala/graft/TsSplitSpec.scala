package graft

import graft.tsdb._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.spark_partition_id

/** Hot-series time-splitting (`splitNs`) for the ordered per-series
  * analytics pack — the documented single-task limitation
  * (TsAnalytics.scala header). Pins:
  *   - rate / timeWeightedAvg split output is BIT-IDENTICAL to the
  *     unsplit plan (same rows, same operands, same arithmetic);
  *   - ewmaSmooth split agrees within 1e-9 relative (splitting a
  *     floating-point left fold re-associates it — exactness is
  *     impossible by construction, see ewmaSmoothSplit's Scaladoc);
  *   - a single pathological series actually runs multi-task
  *     (spark_partition_id spread, same probe as PlanSpec's
  *     downsample-skew test). */
class TsSplitSpec extends SparkSpec {
  import spark.implicits._

  /** One hot series: n points, irregular step (7, 11, or 23 ns apart),
    * values that rise and fall (counter resets for rate), sprinkled
    * duplicate-timestamp versions (latest-version merge must hold) and
    * null values (null-predecessor rows must stay null). A long gap
    * leaves several chunks empty. */
  def hotSeries(n: Int): Seq[TP] = {
    var t = 0L
    (0 until n).flatMap { i =>
      t += (if (i % 3 == 0) 7L else if (i % 3 == 1) 11L else 23L)
      if (i == n / 2) t += 1000L // gap spanning several empty chunks
      val v: FV =
        if (i % 37 == 5) FV(d = None) // null value, field present
        else FV.dv(if (i % 17 == 0) 1.0 else (i % 13) * 3.5 + i * 0.01)
      val base = TP("hot", Map("h" -> "1"), t, Map("value" -> v), seq = i.toLong)
      if (i % 29 == 3) // shadowed older version at the same timestamp
        Seq(base, TP("hot", Map("h" -> "1"), t,
          Map("value" -> FV.dv(-999.0)), seq = -1L))
      else Seq(base)
    }
  }

  def fixture: DataFrame =
    (hotSeries(300) ++
      // a second, sparse series so per-series isolation is exercised
      (0 until 7).map(i => TP("hot", Map("h" -> "2"), i * 400L,
        Map("value" -> FV.dv(10.0 + i)), seq = 1000L + i))).toDF()

  val P = QueryParams("hot", endNs = Some(10000000L))
  val Split = Some(50L) // ~3–5 points per chunk on the hot series

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  test("rate: split output is bit-identical to the unsplit plan") {
    val pts = fixture
    for (reset <- Seq(true, false)) {
      val unsplit = rows(TsAnalytics.rate(pts, P, counterReset = reset))
      val split = rows(TsAnalytics.rate(pts, P, counterReset = reset,
        splitNs = Split))
      assert(unsplit.nonEmpty)
      assert(split == unsplit, s"counterReset=$reset: split != unsplit")
    }
  }

  test("rate: chunk-boundary predecessor comes from the nearest non-empty chunk") {
    // two points in chunks far apart (all chunks between are empty):
    // the second point's delta must reach back across the empty chunks
    val pts = Seq(
      TP("m", Map.empty[String, String], 10L, Map("value" -> FV.dv(3.0)), 0),
      TP("m", Map.empty[String, String], 510L, Map("value" -> FV.dv(8.0)), 1)).toDF()
    val out = TsAnalytics.rate(pts, QueryParams("m", endNs = Some(1000)),
      splitNs = Some(50L))
      .select($"timestamp", $"delta").as[(Long, Double)].collect().toSeq
    assert(out == Seq((510L, 5.0)))
  }

  test("timeWeightedAvg: split output is bit-identical to the unsplit plan") {
    val pts = fixture
    val q = P.copy(downsampleNs = Some(100L))
    val unsplit = rows(TsAnalytics.timeWeightedAvg(pts, q))
    val split = rows(TsAnalytics.timeWeightedAvg(pts, q, splitNs = Split))
    assert(unsplit.nonEmpty)
    assert(split == unsplit)
  }

  test("timeWeightedAvg: split window-edge weight for a chunk's last point") {
    // chunk size < window size: the carried-forward weight of a chunk's
    // last point must still clip at the WINDOW edge, not the chunk edge
    val pts = Seq(
      TP("m", Map.empty[String, String], 0L, Map("value" -> FV.dv(2.0)), 0),
      TP("m", Map.empty[String, String], 30L, Map("value" -> FV.dv(6.0)), 1),
      TP("m", Map.empty[String, String], 250L, Map("value" -> FV.dv(100.0)), 2)).toDF()
    val q = QueryParams("m", endNs = Some(1000), downsampleNs = Some(200L))
    val got = TsAnalytics.timeWeightedAvg(pts, q, splitNs = Some(50L))
      .select($"window_start", $"twa").as[(Long, Double)].collect().toMap
    // window 0: v=2 holds [0,30) w=30, v=6 holds [30,200) w=170
    assert(math.abs(got(0L) - (2.0 * 30 + 6.0 * 170) / 200.0) < 1e-12)
    assert(got(200L) == 100.0)
  }

  test("ewmaSmooth: split agrees with unsplit within 1e-9 relative") {
    val pts = fixture
    for (alpha <- Seq(0.05, 0.5, 0.97)) {
      val unsplit = TsAnalytics.ewmaSmooth(pts, P, alpha)
        .select($"series_key", $"timestamp", $"ewma")
        .as[(String, Long, Double)].collect().toSeq
      val split = TsAnalytics.ewmaSmooth(pts, P, alpha, splitNs = Split)
        .select($"series_key", $"timestamp", $"ewma")
        .as[(String, Long, Double)].collect().toSeq
      assert(unsplit.nonEmpty && split.size == unsplit.size)
      unsplit.zip(split).foreach { case ((k1, t1, e1), (k2, t2, e2)) =>
        assert(k1 == k2 && t1 == t2, "row alignment")
        val tol = 1e-9 * math.max(1.0, math.abs(e1))
        assert(math.abs(e1 - e2) <= tol, s"series $k1 ts $t1: $e1 vs $e2")
      }
    }
  }

  test("holtSmooth: split agrees with unsplit within 1e-9 relative") {
    val pts = fixture
    for ((alpha, beta) <- Seq((0.3, 0.1), (0.8, 0.6))) {
      val unsplit = TsAnalytics.holtSmooth(pts, P, alpha, beta)
        .select($"series_key", $"timestamp", $"level", $"trend", $"forecast")
        .as[(String, Long, Double, Double, Double)].collect().toSeq
      val split = TsAnalytics.holtSmooth(pts, P, alpha, beta, splitNs = Split)
        .select($"series_key", $"timestamp", $"level", $"trend", $"forecast")
        .as[(String, Long, Double, Double, Double)].collect().toSeq
      assert(unsplit.nonEmpty && split.size == unsplit.size)
      unsplit.zip(split).foreach {
        case ((k1, t1, l1, b1, f1), (k2, t2, l2, b2, f2)) =>
          assert(k1 == k2 && t1 == t2, "row alignment")
          def close(x: Double, y: Double, what: String): Unit = {
            val tol = 1e-9 * math.max(1.0, math.abs(x))
            assert(math.abs(x - y) <= tol, s"series $k1 ts $t1 $what: $x vs $y")
          }
          close(l1, l2, "level"); close(b1, b2, "trend"); close(f1, f2, "forecast")
      }
    }
  }

  test("holtSmooth: split first point is the seeded (v1, 0) state") {
    val pts = Seq(
      TP("m", Map.empty[String, String], 5L, Map("value" -> FV.dv(12.0)), 0),
      TP("m", Map.empty[String, String], 105L, Map("value" -> FV.dv(20.0)), 1)).toDF()
    val got = TsAnalytics.holtSmooth(pts, QueryParams("m", endNs = Some(1000)),
      alpha = 0.5, beta = 0.5, splitNs = Some(50L))
      .select($"timestamp", $"level", $"trend").as[(Long, Double, Double)]
      .collect().map { case (t, l, b) => t -> ((l, b)) }.toMap
    assert(got(5L) == ((12.0, 0.0)))
    // l2 = .5·20 + .5·12 = 16, b2 = .5·(16−12) + .5·0 = 2 — across a chunk gap
    assert(math.abs(got(105L)._1 - 16.0) < 1e-12)
    assert(math.abs(got(105L)._2 - 2.0) < 1e-12)
  }

  test("ewmaSmooth: split first chunk seeds with the first value") {
    val pts = Seq(
      TP("m", Map.empty[String, String], 5L, Map("value" -> FV.dv(40.0)), 0),
      TP("m", Map.empty[String, String], 15L, Map("value" -> FV.dv(0.0)), 1),
      TP("m", Map.empty[String, String], 105L, Map("value" -> FV.dv(8.0)), 2)).toDF()
    val got = TsAnalytics.ewmaSmooth(pts, QueryParams("m", endNs = Some(1000)),
      alpha = 0.5, splitNs = Some(50L))
      .select($"timestamp", $"ewma").as[(Long, Double)].collect().toMap
    assert(got(5L) == 40.0) // seeded-first convention survives the split
    assert(math.abs(got(15L) - 20.0) < 1e-12)
    assert(math.abs(got(105L) - 14.0) < 1e-12) // carry crossed a chunk boundary
  }

  test("rollingZScore: split is bit-identical (context replication)") {
    val pts = fixture
    // lookback 7 > typical chunk population (3-5 rows): trailing windows
    // routinely cross MULTIPLE chunk boundaries — the hard case the
    // candidate-to-next-k-chunks replication exists for
    for ((lb, mp) <- Seq((7, 3), (20, 5))) {
      val unsplit = rows(TsAnalytics.rollingZScore(pts, P,
        lookback = lb, minPoints = mp))
      val split = rows(TsAnalytics.rollingZScore(pts, P,
        lookback = lb, minPoints = mp, splitNs = Split))
      assert(unsplit.nonEmpty && split == unsplit,
        s"lookback=$lb: split zscore != unsplit")
    }
  }

  test("runningAggregates: split max/index bit-identical, sum within 1e-9") {
    val pts = fixture
    val unsplit = TsAnalytics.runningAggregates(pts, P)
      .select($"series_key", $"timestamp", $"cum_sum", $"cum_max", $"point_index")
      .as[(String, Long, Double, Double, Int)].collect().toSeq
    val split = TsAnalytics.runningAggregates(pts, P, splitNs = Split)
      .select($"series_key", $"timestamp", $"cum_sum", $"cum_max", $"point_index")
      .as[(String, Long, Double, Double, Int)].collect().toSeq
    assert(unsplit.nonEmpty && split.size == unsplit.size)
    unsplit.zip(split).foreach { case ((k1, t1, s1, m1, i1), (k2, t2, s2, m2, i2)) =>
      assert(k1 == k2 && t1 == t2, "row alignment")
      assert(m1 == m2 && i1 == i2, s"max/index must be exact at $k1/$t1")
      val tol = 1e-9 * math.max(1.0, math.abs(s1))
      assert(math.abs(s1 - s2) <= tol, s"cum_sum $k1/$t1: $s1 vs $s2")
    }
  }

  test("autoSplitNs: ~4 chunks per core, floored at 1s, scales with span") {
    val HourNs = 3600L * 1000000000L
    // 32-core, 1-month span → width = span/128 ≈ 5.6h: chunk count fixed
    val w1 = TsAnalytics.autoSplitNs(0L, 30L * 24L * HourNs, 32)
    assert(30L * 24L * HourNs / w1 <= 128 && 30L * 24L * HourNs / w1 >= 64)
    // 100× the span → same chunk count, 100× the width
    val w2 = TsAnalytics.autoSplitNs(0L, 3000L * 24L * HourNs, 32)
    assert(w2 == w1 * 100)
    // tiny span → the 1 s floor wins (chunks never smaller than cadence scale)
    assert(TsAnalytics.autoSplitNs(0L, 1000L, 32) == 1000000000L)
  }

  test("a single hot series spreads across tasks under splitNs") {
    // AQE's size-based coalescing folds a tiny test shuffle back to one
    // partition; disable it to observe the KEY spread (same caveat as
    // PlanSpec's downsample-skew test)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val pts = hotSeries(300).toDF()
      val spread = TsAnalytics.sliceChunked(pts, P, "value", Nil, 50L)
        .select(spark_partition_id()).distinct().count()
      assert(spread > 1, s"hot series must spread across tasks, got $spread")
      // and the unsplit slice is the single-task baseline being escaped
      val (salted, _, _) = QueryEngine.partitionedInput(pts, P)
      assert(salted.select(spark_partition_id()).distinct().count() >= 1)
    } finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
  }

  test("rate split plan: point rows cross ONE exchange, keyed (series_key, __chunk)") {
    val plan = TsAnalytics.rate(fixture, P, splitNs = Split)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    // chunk-keyed exchange present: that's what spreads one hot series
    assert(exchanges.exists(e => e.contains("series_key") && e.contains("__chunk")),
      exchanges.mkString("\n"))
    // the per-chunk window and the bounds groupBy must RIDE the explicit
    // repartition: at most 3 hash exchanges total (points; the tiny
    // summary's per-series window; its join side), never one per stage
    assert(exchanges.size <= 3, plan)
  }

  test("sliceChunked preserves latest-version merge and value filters") {
    val pts = fixture
    val slow = TsAnalytics.slice(fixture, P, "value", Nil)
      .select($"series_key", $"timestamp", $"__v").as[(String, Long, Option[Double])]
      .collect().toSeq.sorted
    val fast = TsAnalytics.sliceChunked(pts, P, "value", Nil, 50L)
      .select($"series_key", $"timestamp", $"__v").as[(String, Long, Option[Double])]
      .collect().toSeq.sorted
    assert(fast == slow)
  }
}
