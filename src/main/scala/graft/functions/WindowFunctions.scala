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
}
