package graft.model

import org.apache.spark.sql.types._

/** Canonical record of the engine — mirrors the reference's tagged,
  * multi-field data point (`core/datapoint.go:7-12`):
  * metric + tag map (series identity) + ns-epoch timestamp + dynamic
  * field map.
  *
  * The reference's `PointValue` union (`core/fields.go:13-21`) is a tagged
  * union of nil/float64/int64/string/bool. In Spark we model it as a sparse
  * struct so the int-vs-float distinction the reference keeps
  * (`core/fields.go:176-184`) survives: exactly one of (d, l, s, b) is
  * non-null, or all null for the nil value.
  */
final case class FieldValue(
    d: Option[Double] = None,
    l: Option[Long] = None,
    s: Option[String] = None,
    b: Option[Boolean] = None) {
  def isNull: Boolean = d.isEmpty && l.isEmpty && s.isEmpty && b.isEmpty
  /** Numeric view: int64 promoted to float64 like the reference's
    * aggregators (`iterator/multi_field_aggregator.go:48-54`). */
  def numeric: Option[Double] = d.orElse(l.map(_.toDouble))
}

object FieldValue {
  def ofDouble(v: Double): FieldValue = FieldValue(d = Some(v))
  def ofLong(v: Long): FieldValue = FieldValue(l = Some(v))
  def ofString(v: String): FieldValue = FieldValue(s = Some(v))
  def ofBool(v: Boolean): FieldValue = FieldValue(b = Some(v))
  val NilValue: FieldValue = FieldValue()

  val sparkType: StructType = StructType(Seq(
    StructField("d", DoubleType, nullable = true),
    StructField("l", LongType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("b", BooleanType, nullable = true)))
}

/** A single ingested point. `timestamp` is nanoseconds since epoch
  * (the reference uses UnixNano throughout, `api/nbql/executor.go:87`). */
final case class DataPoint(
    metric: String,
    tags: Map[String, String],
    timestamp: Long,
    fields: Map[String, FieldValue])

object DataPoint {
  /** Canonical narrow storage schema. `seq` is the monotonically increasing
    * sequence number the reference assigns per write
    * (`engine2/adapter.go:465`) — it breaks ties so the newest version of an
    * identical (series, timestamp) key wins (`iterator/iterator.go:60-62`). */
  val storageSchema: StructType = StructType(Seq(
    StructField("metric", StringType, nullable = false),
    StructField("tags", MapType(StringType, StringType), nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("fields", MapType(StringType, FieldValue.sparkType), nullable = false),
    StructField("seq", LongType, nullable = false)))

  /** Name validation mirroring `core/validator.go`: names must be non-empty
    * and free of the reference's reserved separator bytes (NUL, SOH). */
  def validate(p: DataPoint): Either[String, DataPoint] = {
    def bad(s: String): Boolean = s.exists(c => c == '\u0000' || c == '\u0001')
    if (p.metric == null || p.metric.isEmpty) Left("empty metric name")
    else if (bad(p.metric)) Left(s"invalid metric name: ${p.metric}")
    else if (p.tags.exists { case (k, v) =>
        k.isEmpty || bad(k) || (v != null && bad(v)) })
      Left("invalid tag key/value")
    else Right(p)
  }
}
