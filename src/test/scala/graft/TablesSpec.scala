package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** `Tables.load` must deliver `events.ts` as a ns-epoch long under EVERY
  * physical layout the driver has shipped: parquet TIMESTAMP(NANOS)
  * (read as long via `nanosAsLong`), TIMESTAMP(MICROS) (read as a Spark
  * timestamp — the round-5 regeneration that silently dropped all 14
  * tsdb battery queries from the correctness run), and a raw int64
  * column. Naive wall clocks are interpreted as UTC, matching the DuckDB
  * oracle's `epoch_ns(ts)`. */
class TablesSpec extends SparkSpec {
  import graft.tsdb.Tables

  private def writeAndLoad(dfSql: String): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tables").toString
    spark.sql(dfSql).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.load(spark, dir, "events")
  }

  // 2024-01-01T00:00:01Z in each unit
  private val sec = 1704067201L
  private val ns = sec * 1000000000L

  test("micros-timestamp ts normalizes to ns-epoch long, naive-as-UTC") {
    val df = writeAndLoad(
      s"""SELECT 1L AS event_id,
         |  CAST(timestamp_micros(${sec}000000 + 123456) AS TIMESTAMP_NTZ) AS ts,
         |  2L AS user_id, 'click' AS event_type, 1.5D AS value, 'p' AS props""".stripMargin)
    assert(df.schema("ts").dataType == LongType)
    assert(df.select("ts").head.getLong(0) == ns + 123456000L)
  }

  test("tz-timestamp ts normalizes identically") {
    val df = writeAndLoad(
      s"""SELECT 1L AS event_id, timestamp_micros(${sec}000000 + 7) AS ts,
         |  2L AS user_id, 'click' AS event_type, 1.5D AS value, 'p' AS props""".stripMargin)
    assert(df.schema("ts").dataType == LongType)
    assert(df.select("ts").head.getLong(0) == ns + 7000L)
  }

  test("int64 ts passes through untouched") {
    val df = writeAndLoad(
      s"""SELECT 1L AS event_id, ${ns}L + 42 AS ts, 2L AS user_id,
         |  'click' AS event_type, 1.5D AS value, 'p' AS props""".stripMargin)
    assert(df.schema("ts").dataType == LongType)
    assert(df.select("ts").head.getLong(0) == ns + 42L)
  }

  test("ns filters push to the scan through the conversion (TsPushdown)") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val ns1 = 1704067200000000000L
    val range = ev.filter(org.apache.spark.sql.functions.col("ts") >= ns1)
    val pr = range.queryExecution.executedPlan.toString
    assert(pr.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"), pr)
    val in = ev.filter(org.apache.spark.sql.functions.col("ts")
      .isin(ns1, ns1 + 1000L, ns1 + 7L)) // the +7 ns value has no µs preimage
    val pi = in.queryExecution.executedPlan.toString
    assert(pi.contains("In(ts, ["), pi)
    // >10 items: OptimizeIn turns the list into InSet first
    val many = (0 until 15).map(i => ns1 + i * 1000L)
    val inset = ev.filter(org.apache.spark.sql.functions.col("ts")
      .isin(many: _*))
    val ps = inset.queryExecution.executedPlan.toString
    // the FILTER lands on the raw column (pushed In + INSET on ts#…);
    // the projection legitimately keeps the conversion for the output
    assert(ps.contains("In(ts, ["), ps)
    assert(!ps.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("unix_micros")), ps)
  }

  test("no-preimage equality keeps three-valued logic on nullable ts") {
    // ns value 1 is off the 1000-grid: no µs preimage. The rewrite must
    // still yield NULL (not FALSE) for a NULL timestamp — observable in
    // projection context and under negation.
    val df = writeAndLoad(
      s"""SELECT * FROM VALUES
         |  (1L, timestamp_micros(${sec}000000), 2L, 'click', 1.5D, 'p'),
         |  (2L, CAST(NULL AS TIMESTAMP), 3L, 'click', 2.5D, 'p')
         |  AS t(event_id, ts, user_id, event_type, value, props)""".stripMargin)
    val proj = df.select(col("event_id"), (col("ts") === lit(1L)).as("eq"))
      .orderBy("event_id").collect()
    assert(!proj(0).isNullAt(1) && !proj(0).getBoolean(1)) // non-null ts → FALSE
    assert(proj(1).isNullAt(1), proj(1).toString)          // null ts → NULL
    // NOT(NULL) = NULL drops the null-ts row; a bare FALSE would keep it
    assert(df.filter(!(col("ts") === lit(1L))).count() == 1L)
    assert(df.filter(!col("ts").isin(1L, 3L)).count() == 1L)
  }

  test("embeddings normalize to array<float> whatever the stored width") {
    val dir = java.nio.file.Files.createTempDirectory("graft_emb").toString
    spark.sql("SELECT 1L AS vec_id, array(CAST(0.5 AS DOUBLE), CAST(-1.25 AS DOUBLE)) AS embedding, 0 AS label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = Tables.load(spark, dir, "embeddings")
    assert(df.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true))
    assert(df.select("embedding").head.getSeq[Float](0) == Seq(0.5f, -1.25f))
  }

  test("eventsAsPoints timestamps line up with the real sf0.001 table") {
    val pts = Tables.eventsAsPoints(spark, "/root/testdata/sf0.001")
    assert(pts.schema("timestamp").dataType == LongType)
    val (lo, hi) = pts.agg(min("timestamp"), max("timestamp"))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)]).head()
    // driver data is all inside 2024 (TESTDATA seed=42 generation)
    assert(lo >= 1704067200000000000L && hi < 1735689600000000000L, s"[$lo,$hi]")
  }
}
