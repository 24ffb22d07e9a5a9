package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events.ts` must reach the engine as a raw ns-epoch long — the
  * reference's representation (UnixNano int64, `core/datapoint.go:10`).
  * The driver has shipped the column as parquet TIMESTAMP(NANOS) (read
  * as long via `spark.sql.legacy.parquet.nanosAsLong`), and as
  * TIMESTAMP(MICROS) (read as a Spark timestamp) — so `load` normalizes
  * by the OBSERVED type, not an assumed physical layout: any
  * timestamp-typed `ts` is converted to ns since epoch with the naive
  * wall clock taken as UTC, exactly how the DuckDB oracle's
  * `epoch_ns(ts)` treats it.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // naive-as-UTC requires the session clock to be UTC (all entry
      // points set it; enforce for ad-hoc sessions)
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        // time-range filters on the computed ns column would stop
        // reaching the scan — TsPushdown inverts them back onto `ts`
        val existing = spark.experimental.extraOptimizations
        if (!existing.contains(graft.plans.TsPushdown))
          spark.experimental.extraOptimizations = existing :+ graft.plans.TsPushdown
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    } else if (name == "embeddings") {
      // same regeneration insurance as events.ts: the vector expressions
      // accept float OR double arrays, but driver-side codebook/centroid
      // collection reads float — pin the observed type to array<float>
      import org.apache.spark.sql.types.{ArrayType, FloatType}
      df.schema("embedding").dataType match {
        case ArrayType(FloatType, _) => df
        case _ => df.withColumn("embedding", col("embedding").cast("array<float>"))
      }
    } else df
  }

  /** The `events` table viewed as the engine's canonical point stream:
    * metric = event_type, series tags = {user: user_id}, ts = ns epoch,
    * fields = {value: double, props: string}, seq = event_id (ingest
    * order stands in for the reference's write sequence number). */
  def eventsAsPoints(spark: SparkSession, sfDir: String): DataFrame =
    eventsView(spark, sfDir, keyed = false)

  /** [[eventsAsPoints]] plus a precomputed `series_key` column (r18):
    * byte-equal to `QueryEngine.seriesKeyCol(metric, tags)` for this
    * view's statically known single-tag shape — {user: user_id} means
    * the generic map_entries → array_sort → transform lambda chain
    * (interpreted per row, no whole-stage codegen) constant-folds to one
    * concat over the typed columns. A null user_id makes a null map
    * value, which array_join skips → empty entry string; coalesce
    * reproduces that case exactly. Consumers (QueryEngine, TsAnalytics,
    * Rollup) reuse a present series_key instead of recomputing. The
    * unkeyed view keeps the canonical 5-column schema for ingest/wire
    * paths whose row layout is itself the contract. */
  def eventsAsPointsKeyed(spark: SparkSession, sfDir: String): DataFrame =
    eventsView(spark, sfDir, keyed = true)

  private def eventsView(spark: SparkSession, sfDir: String,
      keyed: Boolean): DataFrame = {
    val base = Seq(
      col("event_type").as("metric"),
      map(lit("user"), col("user_id").cast("string")).as("tags"),
      col("ts").as("timestamp"),
      map(
        lit("value"), struct(col("value").as("d"), lit(null).cast("long").as("l"),
          lit(null).cast("string").as("s"), lit(null).cast("boolean").as("b")),
        lit("props"), struct(lit(null).cast("double").as("d"), lit(null).cast("long").as("l"),
          col("props").as("s"), lit(null).cast("boolean").as("b"))
      ).as("fields"),
      col("event_id").as("seq"))
    val cols =
      if (!keyed) base
      else base :+ concat(col("event_type"), lit(SeriesKey.Sep),
        coalesce(concat(lit("user="), col("user_id").cast("string")), lit("")))
        .as("series_key")
    load(spark, sfDir, "events").select(cols: _*)
  }
}
