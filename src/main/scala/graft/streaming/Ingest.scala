package graft.streaming

import graft.model.DataPoint
import graft.tsdb.TsdbEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured-Streaming ingest: the high-volume counterpart of the
  * reference's gRPC Put/PutBatch + NBQL PUSH fast path (S1-S3,
  * `engine2/adapter.go:436-751`, `server/tcp_connection_handler.go:122`).
  *
  * Wire format: one JSON object per line/record —
  * `{"metric":…, "tags":{…}, "timestamp":ns, "fields":{name:{"d":…}|{"l":…}|{"s":…}|{"b":…}}}`
  * — parsed with a fixed schema (no inference on the hot path), validated
  * (reference `core/validator.go` name rules), stamped with a write
  * sequence, and appended to the engine's storage by `foreachBatch`.
  *
  * Delivery is AT-LEAST-ONCE (the streaming checkpoint replays an
  * unacknowledged batch after a crash, and parquet append is not
  * transactional), but replays are invisible to readers: a replayed row
  * carries a new seq for the same (series, timestamp) key, and the
  * latest-version-wins merge collapses it; compaction physically drops the
  * dead versions. That pair — checkpoint + version merge — is what the
  * reference's WAL-replay-into-memtable gives it (S4). A Delta sink would
  * upgrade the append itself to transactional exactly-once.
  */
object Ingest {

  val wireSchema: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("timestamp", LongType),
    StructField("fields", MapType(StringType, graft.model.FieldValue.sparkType))))

  /** Parse a stream/frame of JSON strings (column `value`) into canonical
    * points; malformed or invalid-name rows are routed to a `_rejected`
    * flag instead of failing the stream (at 100 TB a poison record must
    * never kill ingest). */
  def parse(raw: DataFrame): DataFrame = {
    val parsed = raw.select(from_json(col("value").cast("string"), wireSchema).as("p"))
      .select(col("p.metric"), col("p.tags"), col("p.timestamp"), col("p.fields"))
    parsed.withColumn("_rejected",
      col("metric").isNull || length(col("metric")) === 0 ||
        col("timestamp").isNull || col("fields").isNull ||
        col("metric").contains(" ") || col("metric").contains("\u0000"))
  }

  /** Start streaming ingest into an engine. Each micro-batch reserves a
    * block of the engine's sequence space; rows get unique, monotonically
    * increasing seqs (later batches always win the version merge). */
  def start(engine: TsdbEngine, source: DataFrame, checkpointDir: String): StreamingQuery = {
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pts = parse(batch).filter(!col("_rejected"))
          .drop("_rejected")
          .withColumn("tags", coalesce(col("tags"), map()))
        val base = engine.reserveSeqBlock()
        engine.putDF(pts.withColumn("seq", lit(base) + monotonically_increasing_id()))
      }
      .start()
  }
}
