package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines. Media ride as opaque `binary` columns plus a typed metadata
  * struct; decode/feature steps run partition-parallel over the bytes.
  *
  * The actual codecs are STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives small deterministic fake features
  * from the bytes. Everything Spark-side is real and tested — the
  * schema, the batch iteration shape (mapPartitions ≙ Python's
  * `mapInPandas`: one iterator of batches per partition, codec state
  * initialized once per partition, never per row), and the
  * partitioning/pushdown behavior (metadata predicates prune before any
  * byte is touched).
  */
object Multimodal {

  /** Typed metadata carried next to the payload bytes. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  final case class MediaRow(media_id: Long, payload: Array[Byte],
      mime: String, width: Int, height: Int)
  final case class MediaFeatures(media_id: Long, n_bytes: Long,
      sha_like: String, brightness: Double, frames_sampled: Int)

  /** Deterministic fake "decode": byte statistics standing in for pixel
    * decoding. Replace the body with a real codec (e.g. TwelveMonkeys /
    * javacv) when the runtime has one — the pipeline shape stays put. */
  def decodeStub(payload: Array[Byte]): (Double, Int) = {
    if (payload == null || payload.isEmpty) (0.0, 0)
    else {
      var s = 0L
      var i = 0
      while (i < payload.length) { s += (payload(i) & 0xff); i += 1 }
      (s.toDouble / payload.length / 255.0, math.max(1, payload.length / 64))
    }
  }

  /** Feature extraction over the binary column: one codec instance per
    * partition (the expensive-init pattern of `mapInPandas`), streaming
    * rows through it. Narrow transformation — no shuffle. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here (once, not per row)
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val (brightness, frames) = decodeStub(r.payload)
        digest.reset()
        val h = digest.digest(if (r.payload == null) Array.emptyByteArray else r.payload)
        MediaFeatures(r.media_id, if (r.payload == null) 0L else r.payload.length.toLong,
          h.map("%02x".format(_)).mkString, brightness, frames)
      }
    }
  }

  /** Column-only byte metadata (no decode): length + content hash +
    * deterministic sample offsets — prunable, codegen'd, oracle-friendly. */
  def byteMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol),
      octet_length(col(payloadCol)).cast("long").as("n_bytes"),
      md5(col(payloadCol)).as("content_md5"))
}
