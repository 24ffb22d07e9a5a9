package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events` carries a nanosecond-precision timestamp; Spark has no ns
  * timestamp type, so we read it as a raw ns-epoch long
  * (`spark.sql.legacy.parquet.nanosAsLong`) — which is exactly the
  * reference's representation (UnixNano int64, `core/datapoint.go:10`).
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** The `events` table viewed as the engine's canonical point stream:
    * metric = event_type, series tags = {user: user_id}, ts = ns epoch,
    * fields = {value: double, props: string}, seq = event_id (ingest
    * order stands in for the reference's write sequence number). */
  def eventsAsPoints(spark: SparkSession, sfDir: String): DataFrame = {
    load(spark, sfDir, "events").select(
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
  }
}
