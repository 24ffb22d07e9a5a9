package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Exponentially-weighted moving average as a NATIVE declarative window
  * aggregate: `ewma_t = α·v_t + (1−α)·ewma_{t−1}`, seeded with the first
  * non-null value (pandas `ewm(adjust=false)` semantics). Null inputs
  * carry the previous smoothed value forward (LOCF of the smoothed line).
  *
  * Why a custom `AggregateWindowFunction` rather than a fold over
  * `collect_list`: the recurrence depends on row ORDER, which no built-in
  * windowed aggregate expresses, and Spark evaluates running
  * (UNBOUNDED PRECEDING → CURRENT ROW) frames of declarative aggregates
  * INCREMENTALLY — one buffer update per row, O(n) per series and
  * streaming, never materializing the series in memory. The update is
  * itself a Catalyst expression tree, so it rides whole-stage codegen
  * like the built-in `row_number`/`nth_value` family. At 100 TB the cost
  * shape equals any per-series ordered scan: one hash exchange on the
  * partition key + in-partition sort.
  *
  * The reference engine has no smoothing operators (its aggregation
  * surface is `iterator/agg_helpers.go`); this is a north-star extension.
  */
case class Ewma(child: Expression, alpha: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(child, alpha)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"ewma input must be numeric, got ${child.dataType.catalogString}")
    else if (!alpha.foldable || !alpha.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        "ewma alpha must be a foldable numeric literal")
    else {
      // SQL literals arrive as DECIMAL — validate through the same cast
      // the update expressions use
      val a = Cast(alpha, DoubleType).eval()
      if (a == null || a.asInstanceOf[Double] <= 0.0 || a.asInstanceOf[Double] > 1.0)
        TypeCheckResult.TypeCheckFailure(s"ewma alpha must be in (0, 1], got $a")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  private lazy val alphaD: Expression = Cast(alpha, DoubleType)
  private lazy val v: Expression = Cast(child, DoubleType)
  private lazy val acc = AttributeReference("ewma_acc", DoubleType)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(acc)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(v), acc,
      If(IsNull(acc), v,
        Add(Multiply(alphaD, v),
          Multiply(Subtract(Literal(1.0), alphaD), acc)))))
  override lazy val evaluateExpression: Expression = acc

  override def prettyName: String = "ewma"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Ewma =
    copy(child = newChildren(0), alpha = newChildren(1))
}

/** Holt's linear-trend (double-exponential) smoothing as a native
  * declarative window aggregate: per row,
  * `l_t = α·v_t + (1−α)·(l_{t−1} + b_{t−1})`,
  * `b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}`, seeded `l_1 = v_1, b_1 = 0`.
  * Returns a `struct(level, trend)` — the one-step forecast is
  * `level + trend`. Same incremental running-frame machinery as [[Ewma]]
  * (O(n) per series, update is a pure expression tree); `b_t` recomputes
  * the `l_t` expression over the same operands, so codegen CSE collapses
  * it and the bits can't diverge. */
case class HoltTrend(child: Expression, alpha: Expression, beta: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(child, alpha, beta)
  override def dataType: DataType = StructType(Seq(
    StructField("level", DoubleType), StructField("trend", DoubleType)))
  override def nullable: Boolean = true

  private def checkRate(e: Expression, what: String): Option[TypeCheckResult] = {
    if (!e.foldable || !e.dataType.isInstanceOf[NumericType])
      Some(TypeCheckResult.TypeCheckFailure(s"$what must be a foldable numeric literal"))
    else {
      val a = Cast(e, DoubleType).eval()
      if (a == null || a.asInstanceOf[Double] <= 0.0 || a.asInstanceOf[Double] > 1.0)
        Some(TypeCheckResult.TypeCheckFailure(s"$what must be in (0, 1], got $a"))
      else None
    }
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"holt_trend input must be numeric, got ${child.dataType.catalogString}")
    else checkRate(alpha, "alpha").orElse(checkRate(beta, "beta"))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  private lazy val a = Cast(alpha, DoubleType)
  private lazy val b = Cast(beta, DoubleType)
  private lazy val v: Expression = Cast(child, DoubleType)
  private lazy val lvl = AttributeReference("holt_level", DoubleType)()
  private lazy val trd = AttributeReference("holt_trend", DoubleType)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(lvl, trd)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType), Literal(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = {
    val newL = Add(Multiply(a, v),
      Multiply(Subtract(Literal(1.0), a), Add(lvl, trd)))
    val newB = Add(Multiply(b, Subtract(newL, lvl)),
      Multiply(Subtract(Literal(1.0), b), trd))
    Seq(
      If(IsNull(v), lvl, If(IsNull(lvl), v, newL)),
      If(IsNull(v), trd, If(IsNull(lvl), Literal(0.0), newB)))
  }
  override lazy val evaluateExpression: Expression =
    If(IsNull(lvl), Literal(null, dataType),
      CreateNamedStruct(Seq(Literal("level"), lvl, Literal("trend"), trd)))

  override def prettyName: String = "holt_trend"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HoltTrend =
    copy(child = newChildren(0), alpha = newChildren(1), beta = newChildren(2))
}

object WindowFunctions {
  /** `ewma(value, alpha) OVER (PARTITION BY part ORDER BY ord ROWS
    * UNBOUNDED PRECEDING)` as a Column.
    *
    * The full `WindowExpression` is built here rather than via
    * `Column.over`: the classic Column→Expression converter wraps any
    * raw `AggregateFunction` in an `AggregateExpression` on the way in
    * (`ColumnNodeToExpressionConverter`'s ExpressionColumnNode arm),
    * which is the wrong shell for an `AggregateWindowFunction` —
    * CheckAnalysis then rejects the window function under the aggregate
    * node. Handing the analyzer a complete `WindowExpression` skips the
    * wrap, exactly as SQL-registered window functions resolve. */
  def ewma(value: Column, alpha: Double, partitionBy: Seq[Column],
      orderBy: Seq[Column]): Column = {
    val fn = Ewma(ColumnBridge.expression(value), Literal(alpha, DoubleType))
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(c => SortOrder(ColumnBridge.expression(c), Ascending)),
      fn.frame)
    ColumnBridge.column(WindowExpression(fn, spec))
  }

  /** `holt_trend(value, alpha, beta) OVER (…)` as a Column — see
    * [[HoltTrend]]; same complete-WindowExpression construction as
    * [[ewma]]. */
  def holtTrend(value: Column, alpha: Double, beta: Double,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = HoltTrend(ColumnBridge.expression(value),
      Literal(alpha, DoubleType), Literal(beta, DoubleType))
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(c => SortOrder(ColumnBridge.expression(c), Ascending)),
      fn.frame)
    ColumnBridge.column(WindowExpression(fn, spec))
  }
}
