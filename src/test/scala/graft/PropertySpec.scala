package graft

import graft.tsdb._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based cross-check: the distributed QueryEngine against a
  * trivially-correct in-memory model of the reference semantics
  * (latest-version-wins, sequence-shadowed tombstones, inclusive range,
  * downsample bucketing). Randomized inputs cover the key-collision and
  * tombstone-interleaving space the example-based specs can't enumerate —
  * the role fuzzing plays in the reference's test suite (SURVEY §5). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Run a scalacheck property with a small fixed budget (each case is a
    * Spark job) and surface the failing case through ScalaTest. */
  def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withMaxSize(24), prop)
    assert(res.passed, res.status.toString)
  }

  case class MPoint(metric: String, host: String, ts: Long, v: Double, seq: Long)
  sealed trait MTomb { def seq: Long }
  case class MPointT(metric: String, host: String, ts: Long, seq: Long) extends MTomb
  case class MSeriesT(metric: String, host: String, seq: Long) extends MTomb
  case class MRangeT(metric: String, host: String, a: Long, b: Long, seq: Long) extends MTomb

  val genPoint: Gen[MPoint] = for {
    m <- Gen.oneOf("m1", "m2")
    h <- Gen.oneOf("a", "b", "c")
    ts <- Gen.choose(0L, 15L)
    v <- Gen.choose(-5, 20).map(_.toDouble)
  } yield MPoint(m, h, ts, v, 0)

  val genTomb: Gen[Long => MTomb] = Gen.oneOf(
    for { m <- Gen.oneOf("m1", "m2"); h <- Gen.oneOf("a", "b", "c");
          ts <- Gen.choose(0L, 15L) } yield (s: Long) => MPointT(m, h, ts, s),
    for { m <- Gen.oneOf("m1", "m2"); h <- Gen.oneOf("a", "b", "c") }
      yield (s: Long) => MSeriesT(m, h, s),
    for { m <- Gen.oneOf("m1", "m2"); h <- Gen.oneOf("a", "b", "c");
          a <- Gen.choose(0L, 15L); len <- Gen.choose(0L, 6L) }
      yield (s: Long) => MRangeT(m, h, a, a + len, s))

  /** model: survivors after latest-version merge + tombstone shadowing. */
  def modelSurvivors(pts: Seq[MPoint], tombs: Seq[MTomb],
      metric: String, lo: Long, hi: Long): Seq[MPoint] = {
    val latest = pts.groupBy(p => (p.metric, p.host, p.ts))
      .map { case (_, vs) => vs.maxBy(_.seq) }.toSeq
    val visible = latest.filterNot { p =>
      tombs.exists {
        case MPointT(m, h, ts, s) => m == p.metric && h == p.host && ts == p.ts && p.seq <= s
        case MSeriesT(m, h, s) => m == p.metric && h == p.host && p.seq <= s
        case MRangeT(m, h, a, b, s) =>
          m == p.metric && h == p.host && p.ts >= a && p.ts <= b && p.seq <= s
      }
    }
    visible.filter(p => p.metric == metric && p.ts >= lo && p.ts <= hi)
  }

  def toDf(pts: Seq[MPoint]) =
    pts.map(p => TP(p.metric, Map("host" -> p.host), p.ts,
      Map("v" -> FV.dv(p.v)), p.seq)).toDF()

  def toTombstones(ts: Seq[MTomb]): Seq[Tombstone] = ts.map {
    case MPointT(m, h, t, s) => PointTombstone(m, Map("host" -> h), t, s)
    case MSeriesT(m, h, s) => SeriesTombstone(m, Map("host" -> h), s)
    case MRangeT(m, h, a, b, s) => RangeTombstone(m, Map("host" -> h), a, b, s)
  }

  test("raw scan == reference model with the anti-join tombstone path") {
    val saved = QueryEngine.antiJoinThreshold
    QueryEngine.antiJoinThreshold = 0 // force broadcast anti-joins
    try rawScanProperty() finally QueryEngine.antiJoinThreshold = saved
  }

  test("raw scan == reference model under random points + tombstones") {
    rawScanProperty()
  }

  private def rawScanProperty(): Unit = {
    check(Prop.forAllNoShrink(Gen.listOf(genPoint), Gen.listOf(genTomb),
      Gen.choose(0L, 8L), Gen.choose(8L, 16L)) {
      (rawPts: List[MPoint], rawTombs: List[Long => MTomb], lo: Long, hi: Long) =>
      // interleave writes and deletes in one sequence space
      val n = rawPts.size
      val pts = rawPts.zipWithIndex.map { case (p, i) => p.copy(seq = i.toLong) }
      val tombs = rawTombs.zipWithIndex.map { case (f, i) =>
        f(n.toLong + i) } // deletes after some writes... mix below
      // shuffle half the tombstone seqs into the middle of the write range
      val mixed = tombs.zipWithIndex.map { case (t, i) =>
        if (i % 2 == 0 && n > 0) (t, (i * 7 % n).toLong) else (t, t.seq)
      }.map {
        case (MPointT(m, h, ts, _), s) => MPointT(m, h, ts, s)
        case (MSeriesT(m, h, _), s) => MSeriesT(m, h, s)
        case (MRangeT(m, h, a, b, _), s) => MRangeT(m, h, a, b, s)
      }
      val expected = modelSurvivors(pts, mixed, "m1", lo, hi)
        .map(p => (p.host, p.ts, p.v)).sorted
      val got = QueryEngine.run(toDf(pts), QueryParams("m1", startNs = lo,
          endNs = Some(hi)), toTombstones(mixed))
        .select($"tags"("host"), $"timestamp", $"fields"("v")("d"))
        .as[(String, Long, Double)].collect().toSeq.sorted
      got == expected
    })
  }

  test("time-salted partitioning changes plans, never results") {
    // same random query evaluated with the (series_key, time) skew-safe
    // exchange and with the legacy series_key-only exchange — identical
    // rows prove the salt is partitioning-only (window keys stay correct)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(genPoint), Gen.choose(1L, 5L)) {
      (rawPts: List[MPoint], interval: Long) =>
      val pts = rawPts.zipWithIndex.map { case (p, i) => p.copy(seq = i.toLong) }
      def results(params: QueryParams, salted: Boolean): Seq[String] = {
        QueryEngine.timeSalting = salted
        try QueryEngine.run(toDf(pts), params).collect().toSeq.map(_.toString).sorted
        finally QueryEngine.timeSalting = true
      }
      val ds = QueryParams("m1", startNs = 0L, endNs = Some(16L),
        downsampleNs = Some(interval),
        aggs = Seq(AggSpec("sum", "v"), AggSpec("count", "*")))
      val raw = QueryParams("m1", startNs = 0L, endNs = Some(16L))
      results(ds, salted = true) == results(ds, salted = false) &&
        results(raw, salted = true) == results(raw, salted = false)
    })
  }

  test("downsample sum/count == reference model bucketing") {
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(genPoint), Gen.choose(1L, 5L)) {
      (rawPts: List[MPoint], interval: Long) =>
      val pts = rawPts.zipWithIndex.map { case (p, i) => p.copy(seq = i.toLong) }
      val latest = pts.groupBy(p => (p.metric, p.host, p.ts))
        .map { case (_, vs) => vs.maxBy(_.seq) }.toSeq
      val lo = 0L; val hi = 16L
      val lastW = ((hi - 1) / interval) * interval
      val expected = latest
        .filter(p => p.metric == "m1" && p.ts >= lo && p.ts <= hi)
        .groupBy(p => (p.host, p.ts - p.ts % interval))
        .collect { case ((h, w), vs) if w <= lastW =>
          (h, w, vs.map(_.v).sum, vs.size.toLong) }
        .toSeq.sorted
      val got = QueryEngine.run(toDf(pts), QueryParams("m1", startNs = lo,
          endNs = Some(hi), downsampleNs = Some(interval),
          aggs = Seq(AggSpec("sum", "v"), AggSpec("count", "*"))))
        .select($"tags"("host"), $"window_start", $"sum_v", $"count_star")
        .as[(String, Long, Double, Long)].collect().toSeq.sorted
      got == expected
    })
  }

  test("group-by-tags == reference model merge across hosts, any grouping") {
    // the tag-grouped operator against the same in-memory model the
    // per-series paths are checked with: collapse-all (Nil) and by-host
    // grouping, random duplicate versions included
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(genPoint), Gen.choose(1L, 5L),
        Gen.oneOf(true, false)) {
      (rawPts: List[MPoint], interval: Long, byHost: Boolean) =>
      val pts = rawPts.zipWithIndex.map { case (p, i) => p.copy(seq = i.toLong) }
      val latest = pts.groupBy(p => (p.metric, p.host, p.ts))
        .map { case (_, vs) => vs.maxBy(_.seq) }.toSeq
      val lo = 0L; val hi = 16L
      val lastW = ((hi - 1) / interval) * interval
      val keyOf: MPoint => String = if (byHost) _.host else _ => "*"
      val expected = latest
        .filter(p => p.metric == "m1" && p.ts >= lo && p.ts <= hi)
        .groupBy(p => (keyOf(p), p.ts - p.ts % interval))
        .collect { case ((g, w), vs) if w <= lastW =>
          (g, w, vs.map(_.v).sum, vs.size.toLong) }
        .toSeq.sorted
      val q = QueryParams("m1", startNs = lo, endNs = Some(hi),
        downsampleNs = Some(interval),
        aggs = Seq(AggSpec("sum", "v"), AggSpec("count", "*")))
      val keys = if (byHost) Seq("host") else Nil
      val out = TsAnalytics.aggregateByTags(toDf(pts), q, keys)
      val got =
        (if (byHost) out.select($"tag_host", $"window_start", $"sum_v", $"count_star")
         else out.select(org.apache.spark.sql.functions.lit("*"),
           $"window_start", $"sum_v", $"count_star"))
        .as[(String, Long, Double, Long)].collect().toSeq.sorted
      got == expected
    })
  }

  test("native ewma/holt window aggregates == in-memory folds, bit-exact") {
    // the declarative update expressions must run the exact IEEE
    // sequence of the reference fold for ANY inputs — no tolerance
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(genPoint),
        Gen.oneOf(0.25, 0.5, 0.3), Gen.oneOf(0.25, 0.5)) {
      (rawPts: List[MPoint], alpha: Double, beta: Double) =>
      val pts = rawPts.zipWithIndex.map { case (p, i) => p.copy(seq = i.toLong) }
      val latest = pts.groupBy(p => (p.metric, p.host, p.ts))
        .map { case (_, vs) => vs.maxBy(_.seq) }.toSeq
        .filter(p => p.metric == "m1" && p.ts >= 0L && p.ts <= 16L)
        .sortBy(p => (p.host, p.ts))
      var ew = Map.empty[String, Double]
      var ho = Map.empty[String, (Double, Double)]
      val expected = latest.map { p =>
        val e = ew.get(p.host) match {
          case None => p.v
          case Some(prev) => alpha * p.v + (1 - alpha) * prev
        }
        ew += (p.host -> e)
        val (l, b) = ho.get(p.host) match {
          case None => (p.v, 0.0)
          case Some((pl, pb)) =>
            val nl = alpha * p.v + (1 - alpha) * (pl + pb)
            (nl, beta * (nl - pl) + (1 - beta) * pb)
        }
        ho += (p.host -> (l, b))
        (p.host, p.ts, e, l, b)
      }.sortBy(r => (r._1, r._2))
      val q = QueryParams("m1", startNs = 0L, endNs = Some(16L))
      val gotE = TsAnalytics.ewmaSmooth(toDf(pts), q, alpha, field = "v")
        .select($"tags"("host"), $"timestamp", $"ewma")
        .as[(String, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
      val gotH = TsAnalytics.holtSmooth(toDf(pts), q, alpha, beta, field = "v")
        .select($"tags"("host"), $"timestamp", $"level", $"trend")
        .as[(String, Long, Double, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
      gotE == expected.map(r => (r._1, r._2, r._3)) &&
        gotH == expected.map(r => (r._1, r._2, r._4, r._5))
    })
  }

  test("shard assign == naive global cumsum for any ids/weights/width") {
    import org.apache.spark.sql.functions.col
    val genRows: Gen[List[(Long, Long)]] = Gen.listOfN(30,
      for { id <- Gen.choose(0L, 400L); w <- Gen.choose(0L, 50L) } yield (id, w))
    check(Prop.forAll(genRows, Gen.choose(1L, 64L), Gen.choose(1L, 100L)) {
      (rows, width, budget) =>
        val uniq = rows.toMap.toSeq // unique ids
        if (uniq.isEmpty) true
        else {
          val got = graft.pipeline.Sharding
            .shardAssign(uniq.toDF("doc_id", "w"), "doc_id", col("w"),
              shardBudget = budget, bucketWidth = width)
            .orderBy("doc_id")
            .as[(Long, Long, Long, Long)].collect().toSeq
          var cum = 0L
          val want = uniq.sortBy(_._1).map { case (id, w) =>
            val before = cum; cum += w; (id, w, cum, before / budget)
          }
          got == want
        }
    })
  }

  test("driver union-find CC == distributed star default == label prop, bit-identical") {
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 3) {
      val edges = List.fill(12 + trial * 10)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val nodes = ((edges.flatMap(t => Seq(t._1, t._2)) ++ Seq(3L, 77L)).distinct).toDF("node")
      val e = edges.toDF("a", "b")
      val fast = graft.pipeline.Dedup.connectedComponents(nodes, e)
        .as[(Long, Long)].collect().toMap
      val before = graft.pipeline.Dedup.driverCcMaxEdges
      graft.pipeline.Dedup.driverCcMaxEdges = 0L // force the distributed (star) path
      try {
        val slow = graft.pipeline.Dedup.connectedComponents(nodes, e)
          .as[(Long, Long)].collect().toMap
        assert(fast == slow, s"trial $trial: driver vs star disagree for $edges")
      } finally graft.pipeline.Dedup.driverCcMaxEdges = before
      val lp = graft.pipeline.Dedup.connectedComponentsLabelProp(nodes, e)
        .as[(Long, Long)].collect().toMap
      assert(fast == lp, s"trial $trial: driver vs label prop disagree for $edges")
    }
  }

  test("star CC == label propagation on random graphs; log rounds on a path") {
    // seeded random graphs instead of scalacheck: every star-CC run is
    // ~2 Spark jobs PER ROUND, so 12 shrinking cases would dominate the
    // suite; four fixed seeds still cover sparse/dense/disconnected shapes
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 4) {
      val nEdges = 8 + trial * 8
      val edges = List.fill(nEdges)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (a, b) => a != b }
      val nodeIds = (edges.flatMap(t => Seq(t._1, t._2)) ++ Seq(7L, 99L)).distinct
      val nodes = nodeIds.toDF("node")
      val e = edges.toDF("a", "b")
      val lp = graft.pipeline.Dedup.connectedComponentsLabelProp(nodes, e)
        .as[(Long, Long)].collect().toMap
      val (starDf, _) = graft.pipeline.Dedup.connectedComponentsStar(nodes, e)
      val star = starDf.as[(Long, Long)].collect().toMap
      assert(star == lp, s"trial $trial: star != label propagation for $edges")
    }

    // the reason the variant exists: a PATH (worst case for label
    // propagation — diameter rounds) must resolve in O(log n) star
    // rounds. 64-node path: diameter 63, log2 = 6; allow slack to 12.
    val n = 64
    val pathNodes = (0L until n.toLong).toDF("node")
    val pathEdges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = graft.pipeline.Dedup.connectedComponentsStar(pathNodes, pathEdges)
    assert(labels.as[(Long, Long)].collect().forall(_._2 == 0L),
      "one path component rooted at 0")
    assert(rounds <= 12, s"star CC took $rounds rounds on a ${n}-node path (want O(log n))")
  }

  test("MG heavy-hitters: bounds hold under any split/merge order") {
    val genStream: Gen[List[String]] = Gen.listOfN(120,
      Gen.frequency(6 -> Gen.const("hot"), 3 -> Gen.oneOf("warm1", "warm2"),
        2 -> Gen.alphaLowerStr.map(_.take(3))))
    check(Prop.forAll(genStream, Gen.choose(2, 8), Gen.choose(1, 5)) {
      (xs, k, nSplits) =>
        val parts = xs.grouped(math.max(1, xs.size / nSplits)).toSeq
        val merged = parts.map { p =>
          val s = new graft.functions.MGSummary(k); p.foreach(s.add(_)); s
        }.reduceLeft { (a, b) => a.merge(b); a }
        val truth = xs.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
        val n = xs.size.toLong
        val it = merged.counts.entrySet().iterator()
        var ok = merged.counts.size <= k - 1
        while (it.hasNext && ok) {
          val e = it.next()
          val t = truth(e.getKey)
          ok = e.getValue <= t && t <= e.getValue + merged.decrements
        }
        // every item above n/k must be tracked
        ok && truth.forall { case (w, c) =>
          c <= n / k || merged.counts.containsKey(w) }
    })
  }

  test("hot-series splitting: exact family identical, fold family within 1e-9") {
    // random point sets (duplicate timestamps, multiple series) × random
    // chunk widths: the three split mechanisms against their unsplit
    // twins. rate/twa/zscore must be ROW-IDENTICAL (boundary patches and
    // context replication reproduce the exact operand sequences);
    // ewma/cumsum re-associate an FP fold — 1e-9 relative.
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(genPoint),
      Gen.choose(1L, 7L), Gen.choose(2, 5)) {
      (rawPts: List[MPoint], width: Long, lookback: Int) =>
      val pts = rawPts.zipWithIndex.map { case (p, i) => p.copy(seq = i.toLong) }
      val df = toDf(pts)
      val q = QueryParams("m1", startNs = 0L, endNs = Some(16L))
      def same(a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame): Boolean =
        a.collect().toSeq == b.collect().toSeq
      def close(a: Seq[Double], b: Seq[Double]): Boolean =
        a.size == b.size && a.zip(b).forall { case (x, y) =>
          math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)) }
      val w = Some(width)
      same(TsAnalytics.rate(df, q, field = "v"),
        TsAnalytics.rate(df, q, field = "v", splitNs = w)) &&
      same(TsAnalytics.timeWeightedAvg(df, q.copy(downsampleNs = Some(4L)),
          field = "v"),
        TsAnalytics.timeWeightedAvg(df, q.copy(downsampleNs = Some(4L)),
          field = "v", splitNs = w)) &&
      same(TsAnalytics.rollingZScore(df, q, field = "v",
          lookback = lookback, minPoints = 2),
        TsAnalytics.rollingZScore(df, q, field = "v",
          lookback = lookback, minPoints = 2, splitNs = w)) &&
      close(TsAnalytics.ewmaSmooth(df, q, 0.3, field = "v")
          .select($"ewma").as[Double].collect().toSeq,
        TsAnalytics.ewmaSmooth(df, q, 0.3, field = "v", splitNs = w)
          .select($"ewma").as[Double].collect().toSeq) &&
      close(TsAnalytics.runningAggregates(df, q, field = "v")
          .select($"cum_sum").as[Double].collect().toSeq,
        TsAnalytics.runningAggregates(df, q, field = "v", splitNs = w)
          .select($"cum_sum").as[Double].collect().toSeq)
    })
  }

  test("chunking invariants: coverage, stride, sizes, reconstruction") {
    import graft.pipeline.TextAnalysis
    val genDoc = for {
      n <- Gen.choose(1, 60)
      ws <- Gen.listOfN(n, Gen.choose('a', 'z').map(c => s"$c${n % 7}"))
    } yield ws
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(genDoc),
      Gen.choose(2, 12), Gen.choose(0, 6)) {
      (docs: List[List[String]], chunkTokens: Int, overlapRaw: Int) =>
      val overlap = math.min(overlapRaw, chunkTokens - 1)
      val step = chunkTokens - overlap
      val df = docs.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
      val chunks = TextAnalysis.chunkDocs(df, "doc_id", "text",
          chunkTokens, overlap)
        .collect().groupBy(_.getLong(0))
        .map { case (id, rs) => id -> rs.sortBy(_.getInt(1)) }
      docs.zipWithIndex.forall { case (ws, i) =>
        val cs = chunks(i.toLong)
        val starts = cs.map(_.getInt(2)).toSeq
        val texts = cs.map(_.getString(4).split(" ").toSeq).toSeq
        // stride: starts are 0, step, 2·step …
        starts == starts.indices.map(_ * step) &&
        // sizes: all full except possibly the last, which is non-empty
        texts.init.forall(_.size == chunkTokens) &&
        texts.last.nonEmpty && texts.last.size <= chunkTokens &&
        // content: chunk k is exactly tokens [k·step, k·step+len)
        texts.zip(starts).forall { case (t, s0) =>
          t == ws.slice(s0, s0 + t.size) } &&
        // coverage + reconstruction: step-prefixes + last chunk = doc
        (texts.init.flatMap(_.take(step)) ++ texts.last).toList == ws
      }
    })
  }

  test("DELTA tiers agree: raw analytic == rollup route == driver fold") {
    // integer-valued points make every sum exact, so the three tiers
    // must agree BIT-FOR-BIT on random inputs at any rollup width
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(genPoint),
      Gen.oneOf(1L, 2L, 4L, 8L, 16L)) { (rawPts: List[MPoint], width: Long) =>
      val pts = rawPts.zipWithIndex.map { case (p, i) => p.copy(seq = i.toLong) }
      val df = toDf(pts)
      val q = QueryParams("m1", startNs = 0L, endNs = Some(15L))
      def key(r: org.apache.spark.sql.Row) = r.getAs[String]("series_key")
      def vals(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("n_points"), r.getAs[Long]("first_ts"),
          r.getAs[Long]("last_ts"), r.getAs[Double]("delta"),
          r.getAs[Double]("increase"))
      val raw = TsAnalytics.rangeDelta(df, q, field = "v")
        .collect().map(r => key(r) -> vals(r)).toMap
      val rollup = Rollup.build(QueryEngine.mergedView(df, Nil), width, Seq("v"))
      val routed = Rollup.runDelta(rollup, width, q, "v")
        .collect().map(r => key(r) -> vals(r)).toMap
      val rows = rollup.orderBy("window_start").collect()
      val local = LocalRollup.runDelta(rows, rollup.schema, q, "v")
        .map(r => r.getString(2) ->
          (r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6),
            r.getDouble(7))).toMap
      raw == routed && raw == local
    })
  }

  test("IRATE tiers agree: raw analytic == driver fold from partials") {
    // the trailing sample pair is recoverable exactly from the stored
    // __plast/__last partials at ANY rollup width: a ≥2-sample window
    // carries its own pair, a 1-sample window pairs with the previous
    // non-empty window's last — the fold must match the raw irate
    // bit-for-bit (identical doubles, identical IEEE rate division)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(genPoint),
      Gen.oneOf(1L, 2L, 4L, 8L, 16L)) { (rawPts: List[MPoint], width: Long) =>
      val pts = rawPts.zipWithIndex.map { case (p, i) => p.copy(seq = i.toLong) }
      val df = toDf(pts)
      val q = QueryParams("m1", startNs = 0L, endNs = Some(15L))
      val raw = TsAnalytics.irate(df, q, field = "v")
        .collect().map(r => r.getAs[String]("series_key") ->
          (r.getAs[Long]("timestamp"), r.getAs[Double]("value"),
            r.getAs[Double]("delta"), r.getAs[Double]("rate_per_sec"))).toMap
      val rollup = Rollup.build(QueryEngine.mergedView(df, Nil), width, Seq("v"))
      val rows = rollup.orderBy("window_start").collect()
      val local = LocalRollup.runIrate(rows, rollup.schema, q, "v")
        .map(r => r.getString(2) ->
          (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
      raw == local
    })
  }

  test("EWMA/HOLT BY tiers agree: raw windowed fold == rollup-served states (bit-identical)") {
    // the stored smoothing state IS the raw sequential fold sampled at
    // window ends (not a transit-matrix composition — that would be
    // ulp-level), so the routed read must match bit-for-bit at any
    // rollup width and any multiple target window, on random inputs
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(genPoint),
      Gen.oneOf(1L, 2L, 4L, 8L), Gen.oneOf(1L, 2L, 4L)) {
      (rawPts: List[MPoint], width: Long, mult: Long) =>
      val pts = rawPts.zipWithIndex.map { case (p, i) => p.copy(seq = i.toLong) }
      val df = toDf(pts)
      val q = QueryParams("m1", startNs = 0L, endNs = Some(15L))
      val sE = SmoothSpec("v", "ewma", 0.25)
      val sH = SmoothSpec("v", "holt", 0.25, 0.5)
      val rollup = Rollup.build(QueryEngine.mergedView(df, Nil), width,
        Seq("v"), smooth = Seq(sE, sH))
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[String]("series_key"), r.getAs[Long]("window_start"))
      val rawE = TsAnalytics.ewmaSmoothBy(df, q, 0.25, width * mult, field = "v")
        .collect().map(r => key(r) -> r.toSeq).toMap
      val routedE = Rollup.runSmoothBy(rollup, width, q, sE, width * mult)
        .collect().map(r => key(r) -> r.toSeq).toMap
      val rawH = TsAnalytics.holtSmoothBy(df, q, 0.25, 0.5, width * mult, field = "v")
        .collect().map(r => key(r) -> r.toSeq).toMap
      val routedH = Rollup.runSmoothBy(rollup, width, q, sH, width * mult)
        .collect().map(r => key(r) -> r.toSeq).toMap
      rawE == routedE && rawH == routedH
    })
  }

  test("RESETS/CHANGES tiers agree: raw == rollup route == driver fold == model") {
    // transition counts are LONGS — no FP re-association anywhere, so
    // all three tiers must agree bit-for-bit at any rollup width, and
    // with an in-memory pairwise model over the survivor series
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(genPoint),
      Gen.oneOf(1L, 2L, 4L, 8L, 16L)) { (rawPts: List[MPoint], width: Long) =>
      val pts = rawPts.zipWithIndex.map { case (p, i) => p.copy(seq = i.toLong) }
      val df = toDf(pts)
      val q = QueryParams("m1", startNs = 0L, endNs = Some(15L))
      def vals(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("n_points"), r.getAs[Long]("resets"),
          r.getAs[Long]("changes"))
      val raw = TsAnalytics.transitions(df, q, field = "v")
        .collect().map(r => r.getAs[String]("series_key") -> vals(r)).toMap
      val rollup = Rollup.build(QueryEngine.mergedView(df, Nil), width, Seq("v"))
      val routed = Rollup.runTransitions(rollup, width, q, "v")
        .collect().map(r => r.getAs[String]("series_key") -> vals(r)).toMap
      val rows = rollup.orderBy("window_start").collect()
      def localOf(keep: String) =
        LocalRollup.runTransitions(rows, rollup.schema, q, "v", keep)
          .map(r => r.getString(2) -> (r.getLong(3), r.getLong(4))).toMap
      val localR = localOf("resets"); val localC = localOf("changes")
      val want = modelSurvivors(pts, Nil, "m1", 0L, 15L)
        .groupBy(_.host).map { case (h, ps0) =>
          val ps = ps0.sortBy(_.ts)
          val pairs = ps.sliding(2).toSeq.collect { case Seq(a, b) => (a.v, b.v) }
          s"m1${SeriesKey.Sep}host=$h" -> (ps.size.toLong,
            pairs.count { case (a, b) => b < a }.toLong,
            pairs.count { case (a, b) => b != a }.toLong)
        }
      // windowed decomposition at a target window 2× the grain: per-window
      // counts from all three tiers agree and sum to the whole-range counts
      val target = width * 2
      def valsBy(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("n_points"), r.getAs[Long]("resets"),
          r.getAs[Long]("changes"))
      def keyBy(r: org.apache.spark.sql.Row) =
        (r.getAs[String]("series_key"), r.getAs[Long]("window_start"))
      val rawBy = TsAnalytics.windowedTransitions(df, q, target, field = "v")
        .collect().map(r => keyBy(r) -> valsBy(r)).toMap
      val routedBy = Rollup.runTransitionsBy(rollup, width, q, "v", target)
        .collect().map(r => keyBy(r) -> valsBy(r)).toMap
      val localBy =
        LocalRollup.runTransitionsBy(rows, rollup.schema, q, "v", target, "resets")
          .map(r => (r.getString(2), r.getLong(3)) -> (r.getLong(4), r.getLong(5)))
          .toMap
      val summed = rawBy.toSeq.groupBy(_._1._1).map { case (sk, ws) =>
        sk -> (ws.map(_._2._1).sum, ws.map(_._2._2).sum, ws.map(_._2._3).sum) }

      raw == routed && raw == want &&
        raw.map { case (k, (n, r, _)) => k -> (n, r) } == localR &&
        raw.map { case (k, (n, _, c)) => k -> (n, c) } == localC &&
        rawBy == routedBy &&
        rawBy.map { case (k, (n, r, _)) => k -> (n, r) } == localBy &&
        summed == raw &&
        // a reset is always also a change
        raw.values.forall { case (_, r, c) => r <= c }
    })
  }

  test("delta/irate/predict == reference model under random points") {
    // whole-range change, last-pair rate, and least-squares forecast
    // against an in-memory model over the latest-version-merged series
    // (duplicate timestamps resolved by max seq, like the engine).
    // delta/irate are exact rational arithmetic on the same doubles;
    // predict compares within 1e-9 (moment sums re-associate).
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(genPoint), Gen.choose(1L, 7L)) {
      (rawPts: List[MPoint], width: Long) =>
      val pts = rawPts.zipWithIndex.map { case (p, i) => p.copy(seq = i.toLong) }
      val df = toDf(pts)
      val q = QueryParams("m1", startNs = 0L, endNs = Some(16L))
      val perSeries = modelSurvivors(pts, Nil, "m1", 0L, 16L)
        .groupBy(_.host).map { case (h, ps) => h -> ps.sortBy(_.ts) }

      // model: delta/increase/irate
      val wantDelta = perSeries.map { case (h, ps) =>
        val inc = ps.sliding(2).collect { case Seq(a, b) =>
          if (b.v < a.v) b.v else b.v - a.v }.sum
        h -> (ps.size.toLong, ps.last.v - ps.head.v, if (ps.size < 2) 0.0 else inc)
      }
      val gotDelta = TsAnalytics.rangeDelta(df, q, field = "v")
        .collect().map(r => r.getAs[Map[String, String]]("tags")("host") ->
          (r.getAs[Long]("n_points"), r.getAs[Double]("delta"),
            r.getAs[Double]("increase"))).toMap
      val deltaOk = wantDelta == gotDelta &&
        gotDelta == TsAnalytics.rangeDelta(df, q, field = "v",
          splitNs = Some(width)).collect()
          .map(r => r.getAs[Map[String, String]]("tags")("host") ->
            (r.getAs[Long]("n_points"), r.getAs[Double]("delta"),
              r.getAs[Double]("increase"))).toMap

      val wantIrate = perSeries.collect { case (h, ps) if ps.size >= 2 =>
        val Seq(a, b) = ps.takeRight(2)
        val d = if (b.v < a.v) b.v else b.v - a.v
        h -> (b.ts, d, d * 1e9 / (b.ts - a.ts).toDouble)
      }
      val gotIrate = TsAnalytics.irate(df, q, field = "v")
        .collect().map(r => r.getAs[Map[String, String]]("tags")("host") ->
          (r.getAs[Long]("timestamp"), r.getAs[Double]("delta"),
            r.getAs[Double]("rate_per_sec"))).toMap
      val irateOk = wantIrate == gotIrate

      // model: least-squares on (t_sec, v); null slope when degenerate
      val predictOk = TsAnalytics.predictLinear(df, q, horizonNs = 3L,
          field = "v").collect().forall { r =>
        val h = r.getAs[Map[String, String]]("tags")("host")
        val ps = perSeries(h)
        val n = ps.size
        if (n < 2 || ps.map(_.ts).distinct.size < 2)
          r.isNullAt(r.fieldIndex("slope_per_sec"))
        else {
          val t = ps.map(_.ts.toDouble / 1e9); val v = ps.map(_.v)
          val mt = t.sum / n; val mv = v.sum / n
          val varT = t.map(x => x * x).sum / n - mt * mt
          val slope = (t.zip(v).map { case (a, b) => a * b }.sum / n - mt * mv) / varT
          val tt = (ps.last.ts + 3L).toDouble / 1e9
          val pred = mv + slope * (tt - mt)
          math.abs(r.getAs[Double]("slope_per_sec") - slope) <=
            1e-9 * math.max(1.0, math.abs(slope)) &&
          math.abs(r.getAs[Double]("predicted") - pred) <=
            1e-9 * math.max(1.0, math.abs(pred))
        }
      }
      deltaOk && irateOk && predictOk
    })
  }
}
