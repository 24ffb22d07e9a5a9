package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary with `k` counters.
  *
  * Guarantees (the classic ones, preserved under merge — Agarwal et al.,
  * "Mergeable Summaries", PODS'12): every item whose true count exceeds
  * N/k is present; for any tracked item,
  * `est ≤ true ≤ est + decrements` where `decrements` is the summary's
  * accumulated decrement mass. State is O(k) regardless of stream length
  * — the one-pass, map-side-combining alternative to the exact
  * `ngram_topk` aggregation when the dictionary itself (not the data)
  * is the bottleneck at 100 TB. */
final class MGSummary(val k: Int) extends Serializable {
  require(k >= 2, "need at least 2 counters")
  val counts = new java.util.HashMap[String, Long]()
  var decrements: Long = 0L
  var total: Long = 0L

  def add(s: String, w: Long = 1L): Unit = {
    total += w
    val cur = counts.get(s)
    if (counts.containsKey(s)) counts.put(s, cur + w)
    else {
      counts.put(s, w)
      if (counts.size > k - 1) shrink()
    }
  }

  /** Subtract the minimum tracked count from every counter, drop zeros —
    * the batched form of the per-item decrement. */
  private def shrink(): Unit = {
    var min = Long.MaxValue
    val it = counts.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v < min) min = v }
    decrements += min
    val eit = counts.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      val nv = e.getValue - min
      if (nv <= 0) eit.remove() else e.setValue(nv)
    }
  }

  def merge(other: MGSummary): Unit = {
    total += other.total
    decrements += other.decrements
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      if (counts.containsKey(e.getKey)) counts.put(e.getKey, cur + e.getValue)
      else counts.put(e.getKey, e.getValue)
    }
    // restore the k-1 counter bound: subtract the k-th largest count
    if (counts.size > k - 1) {
      val vals = new java.util.ArrayList[Long](counts.values())
      java.util.Collections.sort(vals, java.util.Collections.reverseOrder[Long]())
      val cut = vals.get(k - 1)
      decrements += cut
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - cut
        if (nv <= 0) eit.remove() else e.setValue(nv)
      }
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(k); out.writeLong(decrements); out.writeLong(total)
    out.writeInt(counts.size)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }
}

object MGSummary {
  def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new MGSummary(in.readInt())
    s.decrements = in.readLong(); s.total = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      s.counts.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    s
  }
}

/** `heavy_hitters(col, k)` — approximate top items of a string column as
  * `array<struct<item, est, err>>` sorted by (est desc, item asc):
  * `est ≤ true ≤ est + err` per item, every item above N/k guaranteed
  * present. */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: MGSummary, input: MGSummary): MGSummary = {
    buffer.merge(input); buffer
  }

  override def eval(buffer: MGSummary): Any = {
    val entries = new java.util.ArrayList(buffer.counts.entrySet())
    java.util.Collections.sort(entries,
      new java.util.Comparator[java.util.Map.Entry[String, Long]] {
        override def compare(a: java.util.Map.Entry[String, Long],
            b: java.util.Map.Entry[String, Long]): Int = {
          val c = java.lang.Long.compare(b.getValue, a.getValue)
          if (c != 0) c else a.getKey.compareTo(b.getKey)
        }
      })
    val rows = new Array[Any](entries.size())
    var i = 0
    while (i < rows.length) {
      val e = entries.get(i)
      rows(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue, buffer.decrements))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: MGSummary): Array[Byte] = buffer.serialize()
  override def deserialize(storage: Array[Byte]): MGSummary =
    MGSummary.deserialize(storage)

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersFunctions {
  import org.apache.spark.sql.graft.ColumnBridge

  def heavy_hitters(col: Column, k: Int): Column =
    ColumnBridge.column(
      HeavyHittersAgg(ColumnBridge.expression(col), k).toAggregateExpression())
}
