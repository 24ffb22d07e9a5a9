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

object TDigestFunctions {
  import org.apache.spark.sql.graft.ColumnBridge

  def tdigest_percentile(col: Column, q: Double, compression: Double = 100.0): Column =
    ColumnBridge.column(
      TDigestPercentileAgg(ColumnBridge.expression(col), q, compression)
        .toAggregateExpression())
}
