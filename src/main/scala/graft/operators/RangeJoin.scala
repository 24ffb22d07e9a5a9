package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.IntegralDivide

/** Interval (range) join — pair every right ROW whose time falls inside a
  * left INTERVAL `[start, end]` (inclusive both ends, the reference's
  * time-range convention, `core/query.go` range scans). Spark plans a
  * bare inequality join as BroadcastNestedLoopJoin — quadratic work and a
  * broadcast of a whole side, a non-starter at 100 TB.
  *
  * Implementation is bin-and-verify, the standard scalable reduction:
  * quantize the time axis into `binWidth`-ns bins, explode each interval
  * to the bins it covers (⌈len/W⌉+1 rows — bounded fanout when W is at
  * least the typical interval length), tag each right row with its single
  * bin, hash-join on (keys…, bin), then verify the exact predicate. Every
  * surviving pair is found in EXACTLY the bin holding the right row's
  * time, so no dedup pass is needed. The join is a plain shuffled hash
  * join: co-partitioned, AQE-skew-splittable, no broadcast of either
  * side; a hot bin (time skew) splits like any other skewed key.
  */
object RangeJoin {

  /** Exact long floor-division bin (`div`) — double division rounds
    * ns-epoch values above 2^53, which could file a row one bin off from
    * the interval that covers it. */
  private def bin(c: Column, w: Long): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(c - pmod(c, lit(w))),
      ColumnBridge.expression(lit(w)))).cast("long")

  /** @param left      frame holding `[leftStart, leftEnd]` interval columns
    * @param right     frame holding the `rightTime` instant column
    * @param by        optional equality keys present in BOTH frames
    * @param binWidth  time-axis quantum (ns). Fanout per interval is
    *                  ⌈(end-start)/binWidth⌉+1 copies — pick the typical
    *                  interval length (a 30 min attribution window over
    *                  binWidth=30 min explodes to ≤2 rows).
    * @return left columns ++ right non-key columns, one row per matching
    *         (interval, instant) pair. Column sets other than `by` must
    *         be disjoint (rename upstream — same contract as a plain
    *         `join`). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String, rightTime: String,
      binWidth: Long, by: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val lb = left.withColumn("__bin",
      explode(sequence(bin(col(leftStart), binWidth), bin(col(leftEnd), binWidth))))
    val rb = right.withColumn("__bin", bin(col(rightTime), binWidth))
    lb.join(rb, by :+ "__bin")
      .filter(col(rightTime) >= col(leftStart) && col(rightTime) <= col(leftEnd))
      .drop("__bin")
  }
}
