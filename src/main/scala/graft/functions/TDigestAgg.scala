package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `tdigest_percentile(col, q[, compression])` — approximate percentile as
  * a mergeable t-digest sketch, the same sketch family the reference uses
  * for its `p<N>` aggregations (`iterator/agg_helpers.go:8-16`).
  *
  * A `TypedImperativeAggregate`: the buffer is a [[TDigest]], updated
  * per-row on executors, partial sketches serialized and merged across
  * partitions — O(δ) state regardless of row count, which is what makes
  * p99.9 over 100 TB a one-pass map-side-combining aggregation instead of
  * a full sort. The oracle-facing battery keeps EXACT `percentile` (SURVEY
  * §7.3 recommends exact for cross-engine parity); this function is the
  * scale path, accuracy-tested against exact in TDigestSpec. */
case class TDigestPercentileAgg(
    child: Expression,
    q: Double,
    compression: Double = 100.0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  require(q >= 0 && q <= 1, "quantile must be in [0,1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) {
      val d = child.dataType match {
        case DoubleType => v.asInstanceOf[Double]
        case FloatType => v.asInstanceOf[Float].toDouble
        case LongType => v.asInstanceOf[Long].toDouble
        case IntegerType => v.asInstanceOf[Int].toDouble
        case _ => v.toString.toDouble
      }
      if (!d.isNaN && !d.isInfinite) buffer.add(d)
    }
    buffer
  }

  override def merge(buffer: TDigest, input: TDigest): TDigest = {
    buffer.merge(input); buffer
  }

  override def eval(buffer: TDigest): Any = buffer.quantile(q)

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(storage: Array[Byte]): TDigest = TDigest.deserialize(storage)

  override def withNewMutableAggBufferOffset(offset: Int): TDigestPercentileAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestPercentileAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def prettyName: String = "tdigest_percentile"
}

/** `tdigest_sketch(col[, compression])` — the PARTIAL side of a two-level
  * percentile aggregation: digests the group's values and emits the
  * serialized sketch bytes. Stored per (series, window) in a rollup, the
  * sketches later re-aggregate through [[TDigestMergeQuantileAgg]] —
  * the same partial/merge split the reference's rollup-less design pays
  * per query is here materialized once (`iterator/agg_helpers.go:8-16`
  * uses the identical sketch family). */
case class TDigestSketchAgg(
    child: Expression,
    compression: Double = 100.0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) {
      val d = child.dataType match {
        case DoubleType => v.asInstanceOf[Double]
        case FloatType => v.asInstanceOf[Float].toDouble
        case LongType => v.asInstanceOf[Long].toDouble
        case IntegerType => v.asInstanceOf[Int].toDouble
        case _ => v.toString.toDouble
      }
      if (!d.isNaN && !d.isInfinite) buffer.add(d)
    }
    buffer
  }

  override def merge(buffer: TDigest, input: TDigest): TDigest = {
    buffer.merge(input); buffer
  }

  override def eval(buffer: TDigest): Any = buffer.serialize()

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(storage: Array[Byte]): TDigest = TDigest.deserialize(storage)

  override def withNewMutableAggBufferOffset(offset: Int): TDigestSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def prettyName: String = "tdigest_sketch"
}

/** `tdigest_merge_quantile(sketchCol, q)` — the MERGE side: combines
  * serialized [[TDigest]] sketches (binary column from
  * [[TDigestSketchAgg]]) and evaluates the quantile. NaN over an empty /
  * all-null group, matching the engine's empty-set percentile semantics. */
case class TDigestMergeQuantileAgg(
    child: Expression,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  require(q >= 0 && q <= 1, "quantile must be in [0,1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  // compression rides inside each serialized sketch; an empty buffer is
  // REPLACED by the first incoming sketch so the merged digest keeps the
  // compression the partials were built with (100 is only the empty-group
  // placeholder, reached when every input sketch is null)
  override def createAggregationBuffer(): TDigest = new TDigest(100.0)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = TDigest.deserialize(v.asInstanceOf[Array[Byte]])
      if (buffer.totalWeight == 0.0) in
      else { buffer.merge(in); buffer }
    }
  }

  override def merge(buffer: TDigest, input: TDigest): TDigest =
    if (buffer.totalWeight == 0.0) input
    else { buffer.merge(input); buffer }

  override def eval(buffer: TDigest): Any = buffer.quantile(q)

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(storage: Array[Byte]): TDigest = TDigest.deserialize(storage)

  override def withNewMutableAggBufferOffset(offset: Int): TDigestMergeQuantileAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestMergeQuantileAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def prettyName: String = "tdigest_merge_quantile"
}

object TDigestFunctions {
  import org.apache.spark.sql.graft.ColumnBridge

  def tdigest_percentile(col: Column, q: Double, compression: Double = 100.0): Column =
    ColumnBridge.column(
      TDigestPercentileAgg(ColumnBridge.expression(col), q, compression)
        .toAggregateExpression())

  def tdigest_sketch(col: Column, compression: Double = 100.0): Column =
    ColumnBridge.column(
      TDigestSketchAgg(ColumnBridge.expression(col), compression)
        .toAggregateExpression())

  def tdigest_merge_quantile(col: Column, q: Double): Column =
    ColumnBridge.column(
      TDigestMergeQuantileAgg(ColumnBridge.expression(col), q)
        .toAggregateExpression())
}
