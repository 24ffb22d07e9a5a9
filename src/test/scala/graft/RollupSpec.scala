package graft

import graft.tsdb._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rollup acceleration: a downsample answered from pre-aggregated
  * partials must be ROW-IDENTICAL to the raw path for every decomposable
  * function, across mixed types, missing fields, empty windows, cursors,
  * and limits — and must never touch the raw point frame. */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  private val Min = 60L * 1000000000L // 1 minute in ns
  private val Hr = 60L * Min

  /** Two series over ~3 h with value gaps, an int-typed field, a
    * string-only field (counts but never sums), NaN/Inf inputs (skipped
    * by cleanNumeric), and a duplicate (series, ts) version pair. */
  private def fixture: DataFrame = {
    def p(host: String, tMin: Long, fs: Map[String, FV], seq: Long) =
      TP("cpu.usage", Map("host" -> host), tMin * Min, fs, seq)
    val rows =
      (0 until 150 by 7).map(i => p("h1", i, Map(
        "value" -> FV.dv(math.sin(i) * 10 + i),
        "load" -> FV.lv(i % 13),
        "note" -> FV.sv(s"n$i")), i)) ++
      (0 until 150 by 11).map(i => p("h2", i, Map(
        "value" -> FV.dv(if (i % 33 == 0) Double.NaN else 100.0 - i)), 1000 + i)) ++
      Seq(
        p("h2", 44, Map("value" -> FV.dv(Double.PositiveInfinity)), 2000),
        // same (series, ts) twice: seq 3001 must win in BOTH paths
        p("h1", 7, Map("value" -> FV.dv(-5.0)), 3000),
        p("h1", 7, Map("value" -> FV.dv(-6.0)), 3001))
    rows.toDF()
  }

  private val fullAggs = Seq(
    AggSpec("count", "*"), AggSpec("count", "value"), AggSpec("count", "note"),
    AggSpec("sum", "value"), AggSpec("avg", "value"),
    AggSpec("min", "value"), AggSpec("max", "value"),
    AggSpec("first", "value"), AggSpec("last", "value"),
    AggSpec("frac", "value"), AggSpec("stddev", "value"),
    AggSpec("sum", "load"), AggSpec("avg", "load"))

  private def normalize(df: DataFrame): Seq[String] =
    df.drop("tags").collect().map(_.toString).toSeq

  /** stddev re-aggregates via the sum-of-squares identity, which differs
    * from Spark's Welford update only in floating-point rounding — compare
    * it at 1e-9 relative, everything else exactly. */
  private def assertSame(raw: DataFrame, rolled: DataFrame): Unit = {
    val stddevCols = raw.columns.filter(_.startsWith("stddev_")).toSeq
    val exactCols = raw.columns.filterNot(c => stddevCols.contains(c) || c == "tags").toSeq
    assert(normalize(raw.select(exactCols.map(col): _*)) ==
      normalize(rolled.select(exactCols.map(col): _*)))
    val rs = raw.select(stddevCols.map(col): _*).collect()
    val qs = rolled.select(stddevCols.map(col): _*).collect()
    assert(rs.length == qs.length)
    rs.zip(qs).foreach { case (a, b) =>
      stddevCols.indices.foreach { i =>
        val (x, y) = (a.getDouble(i), b.getDouble(i))
        assert((x.isNaN && y.isNaN) || math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)),
          s"stddev mismatch: $x vs $y")
      }
    }
  }

  private def q(aggs: Seq[AggSpec], interval: Long = Hr,
      emitEmpty: Boolean = false, tags: Map[String, String] = Map.empty,
      limit: Option[Long] = None, afterKey: Option[Cursor] = None) =
    QueryParams("cpu.usage", tags, startNs = 0L, endNs = Some(3 * Hr - 1),
      aggs = aggs, downsampleNs = Some(interval),
      emitEmptyWindows = emitEmpty, limit = limit, afterKey = afterKey)

  test("rollup answers every decomposable function identically to raw") {
    val pts = fixture
    val rollup = Rollup.build(QueryEngine.mergedView(pts, Nil), Min,
      Seq("value", "load", "note"))
    val query = q(fullAggs)
    assert(Rollup.supports(query, Min, Set("value", "load", "note")))
    assertSame(QueryEngine.run(pts, query), Rollup.run(rollup, Min, query))
  }

  test("rollup path: empty-window emission, tag filter, cursor + limit") {
    val pts = fixture
    val rollup = Rollup.build(QueryEngine.mergedView(pts, Nil), Min, Seq("value"))
    val aggs = Seq(AggSpec("count", "*"), AggSpec("avg", "value"))
    for (query <- Seq(
        q(aggs, emitEmpty = true),
        q(aggs, tags = Map("host" -> "h2")),
        q(aggs, limit = Some(3)),
        q(aggs, emitEmpty = true, afterKey = Some(Cursor(Hr, "")), limit = Some(2)))) {
      assertSame(QueryEngine.run(pts, query), Rollup.run(rollup, Min, query))
    }
  }

  test("supports: rejects non-divisible, misaligned, relative, percentile") {
    val fields = Set("value")
    assert(Rollup.supports(q(Seq(AggSpec("sum", "value"))), Min, fields))
    // interval not a multiple of the rollup's
    assert(!Rollup.supports(q(Seq(AggSpec("sum", "value")), interval = 90L * 1000000000L),
      Min, fields))
    // range not a union of whole rollup windows
    assert(!Rollup.supports(
      q(Seq(AggSpec("sum", "value"))).copy(endNs = Some(3 * Hr)), Min, fields))
    assert(!Rollup.supports(
      q(Seq(AggSpec("sum", "value"))).copy(startNs = 1L), Min, fields))
    // relative/now resolution
    assert(!Rollup.supports(
      q(Seq(AggSpec("sum", "value"))).copy(relativeNs = Some(Hr)), Min, fields))
    assert(!Rollup.supports(q(Seq(AggSpec("sum", "value"))).copy(endNs = None), Min, fields))
    // percentile is not decomposable; unknown field is not covered
    assert(!Rollup.supports(q(Seq(AggSpec("p95", "value"))), Min, fields))
    assert(!Rollup.supports(q(Seq(AggSpec("sum", "other"))), Min, fields))
  }

  test("engine routing: registered rollup serves eligible shapes, epoch-invalidated") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup_eng").toString
    val eng = new TsdbEngine(spark, s"$dir/db")
    eng.putDF(fixture)
    eng.registerRollup("cpu.usage", Min, Seq("value", "load", "note"))

    val p = q(Seq(AggSpec("sum", "value"), AggSpec("avg", "value"),
      AggSpec("count", "*")))
    def rows(df: DataFrame): Seq[String] = df.collect().map(_.toString).toSeq
    val truth = rows(eng.query(p))
    assert(truth.nonEmpty)
    assert(rows(eng.queryServing(p)) == truth)
    assert(eng.queryCached(p).map(_.toString).toSeq == truth)
    // the routed plan computes over rollup partials, not raw fields
    val plan = eng.queryServing(p).queryExecution.executedPlan.toString
    assert(plan.contains("value__sum") || plan.contains("__cnt_star"),
      s"expected rollup partial columns in plan:\n$plan")

    // ineligible shapes fall back to the view and still answer correctly
    for (pq <- Seq(
        p.copy(aggs = Seq(AggSpec("p50", "value"))),          // percentile
        p.copy(endNs = Some(100L * 1000000000L)),             // misaligned end
        p.copy(downsampleNs = None))) {                       // final agg
      assert(rows(eng.queryServing(pq)) == rows(eng.query(pq)), s"fallback for $pq")
    }

    // a commit to the metric invalidates the rollup: new point visible
    eng.putBatch(Seq(graft.model.DataPoint("cpu.usage", Map("host" -> "h1"),
      100L * Min, Map("value" -> graft.model.FieldValue(d = Some(1234.5))))))
    val updated = rows(eng.queryServing(p))
    assert(updated != truth, "rollup answer must refresh after a commit")
    assert(updated == rows(eng.query(p)))

    // dropRollup restores the merged-view path, same answers
    eng.dropRollup("cpu.usage")
    assert(rows(eng.queryServing(p)) == updated)
  }

  test("rollup plan reads only rollup rows, with one exchange to the target window") {
    val pts = fixture
    val merged = QueryEngine.mergedView(pts, Nil)
    val rollup = Rollup.build(merged, Min, Seq("value"))
    // materialize the rollup the way a real deployment would (parquet),
    // so the query plan's only source is the rollup table
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    rollup.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val query = q(Seq(AggSpec("avg", "value"), AggSpec("count", "*")))
    val out = Rollup.run(stored, Min, query)
    assertSame(QueryEngine.run(pts, query), out)
    val plan = out.queryExecution.executedPlan.toString
    // raw fixture has a `fields` map column; the rollup scan must not
    assert(!plan.contains("fields#"), "rollup path must not read raw points")
    val rowsRead = stored.filter(col("metric") === "cpu.usage").count()
    val rawRows = pts.count()
    assert(rowsRead < rawRows, s"rollup should compress: $rowsRead vs $rawRows")
  }
}
