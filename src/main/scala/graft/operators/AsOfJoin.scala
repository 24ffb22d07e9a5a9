package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark lacks natively and range
  * self-joins implement quadratically. For each left row, attach the
  * latest right row with `rightTime <= leftTime` within the same `by`
  * keys.
  *
  * Implementation is the single-shuffle union trick: tag both inputs,
  * union, sort within each key partition by (time, side) with right rows
  * ordered before left rows at equal timestamps (inclusive <= semantics),
  * and carry the last non-null right payload forward with
  * `last(..., ignoreNulls).over(rowsBetween(unboundedPreceding, 0))`.
  * One hash shuffle on the key + one sort — no range-join row explosion,
  * so it scales to arbitrarily long histories (the plan AQE sees is a
  * plain window, skew-salvageable like any other).
  */
object AsOfJoin {

  /** @param by        equality keys present in both frames
    * @param leftTime  left ordering column name
    * @param rightTime right ordering column name
    * @return left columns + right payload columns (null where no right
    *         row precedes the left row), right time exposed as
    *         `<rightTime>_matched` */
  def backward(left: DataFrame, right: DataFrame, by: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c => by.contains(c)).toSeq
    val leftCols = left.columns.toSeq

    val rpay = struct(col(rightTime).as(s"${rightTime}_matched") +:
      rightPayloadCols.filterNot(_ == rightTime).map(col): _*)
    val r2 = right.select(by.map(col) ++ Seq(col(rightTime).as("__t"),
      lit(0).as("__side"), rpay.as("__rpay"), lit(null).as("__lpay")): _*)

    val lpay = struct(leftCols.map(col): _*)
    val l2 = left.select(by.map(col) ++ Seq(col(leftTime).cast("long").as("__t"),
      lit(1).as("__side"), lit(null).as("__rpay"), lpay.as("__lpay")): _*)

    // align schemas: null literals take the sibling's struct type
    val r2c = r2.withColumn("__lpay", col("__lpay").cast(l2.schema("__lpay").dataType))
    val l2c = l2.withColumn("__rpay", col("__rpay").cast(r2.schema("__rpay").dataType))

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r2c.select(l2c.columns.map(col): _*).union(l2c)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lpay.*") +: Seq(col("__match.*")): _*)
  }
}

/** Gap-based sessionization: consecutive events of the same key belong to
  * one session while the gap between them stays <= `gapNs`. One shuffle
  * (hash by key) + per-partition sort; session ids are a running sum of
  * gap breaks — no state grows beyond the window frame. The streaming
  * twin is `session_window` in Structured Streaming. */
object Sessionize {

  /** Adds `session_id` (0-based per key) to `df`. */
  def byGap(df: DataFrame, key: String, timeCol: String, gapNs: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(timeCol).asc)
    val isBreak = when(
      col(timeCol) - lag(col(timeCol), 1).over(w) > gapNs, 1).otherwise(0)
    df.withColumn("session_id",
      sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: bounds, duration, event count. */
  def sessions(df: DataFrame, key: String, timeCol: String, gapNs: Long): DataFrame =
    byGap(df, key, timeCol, gapNs)
      .groupBy(col(key), col("session_id"))
      .agg(min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_ns", col("session_end") - col("session_start"))
}
