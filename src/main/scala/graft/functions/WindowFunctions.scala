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
  *
  * `seed` (optional, per-row but constant per partition in practice — a
  * joined column) RESUMES the fold: the state before the partition's
  * first row is `seed` instead of "unseeded", so
  * `ewma(suffix, seed = state at prefix end)` is BIT-identical to the
  * tail of `ewma(prefix ++ suffix)` — the primitive behind
  * suffix-incremental maintenance of smoothing rollups
  * ([[graft.tsdb.Rollup]]). A null seed (the default literal) reproduces
  * the unseeded semantics exactly.
  */
case class Ewma(child: Expression, alpha: Expression,
    seed: Expression = Literal(null, DoubleType))
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(child, alpha, seed)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"ewma input must be numeric, got ${child.dataType.catalogString}")
    else if (!alpha.foldable || !alpha.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        "ewma alpha must be a foldable numeric literal")
    else if (!seed.dataType.isInstanceOf[NumericType] &&
        seed.dataType != NullType)
      TypeCheckResult.TypeCheckFailure(
        s"ewma seed must be numeric, got ${seed.dataType.catalogString}")
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
  private lazy val seedD: Expression = Cast(seed, DoubleType)
  private lazy val acc = AttributeReference("ewma_acc", DoubleType)()
  // effective previous state: the buffer once any row has run, else the
  // seed (null seed ⇒ unseeded, the classic first-value initialization)
  private lazy val prev: Expression = If(IsNull(acc), seedD, acc)

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(acc)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(v), prev,
      If(IsNull(prev), v,
        Add(Multiply(alphaD, v),
          Multiply(Subtract(Literal(1.0), alphaD), prev)))))
  override lazy val evaluateExpression: Expression = acc

  override def prettyName: String = "ewma"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Ewma =
    copy(child = newChildren(0), alpha = newChildren(1), seed = newChildren(2))
}

/** Holt's linear-trend (double-exponential) smoothing as a native
  * declarative window aggregate: per row,
  * `l_t = α·v_t + (1−α)·(l_{t−1} + b_{t−1})`,
  * `b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}`, seeded `l_1 = v_1, b_1 = 0`.
  * Returns a `struct(level, trend)` — the one-step forecast is
  * `level + trend`. Same incremental running-frame machinery as [[Ewma]]
  * (O(n) per series, update is a pure expression tree); `b_t` recomputes
  * the `l_t` expression over the same operands, so codegen CSE collapses
  * it and the bits can't diverge.
  *
  * `seedLevel`/`seedTrend` RESUME the fold from a stored (level, trend)
  * state exactly like [[Ewma]]'s `seed` — bit-identical to the tail of
  * the full fold; null seeds (the defaults) reproduce the unseeded
  * semantics. */
case class HoltTrend(child: Expression, alpha: Expression, beta: Expression,
    seedLevel: Expression = Literal(null, DoubleType),
    seedTrend: Expression = Literal(null, DoubleType))
    extends AggregateWindowFunction {

  override def children: Seq[Expression] =
    Seq(child, alpha, beta, seedLevel, seedTrend)
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
    else if (Seq(seedLevel, seedTrend).exists(e =>
        !e.dataType.isInstanceOf[NumericType] && e.dataType != NullType))
      TypeCheckResult.TypeCheckFailure("holt_trend seeds must be numeric")
    else checkRate(alpha, "alpha").orElse(checkRate(beta, "beta"))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  private lazy val a = Cast(alpha, DoubleType)
  private lazy val b = Cast(beta, DoubleType)
  private lazy val v: Expression = Cast(child, DoubleType)
  private lazy val sL: Expression = Cast(seedLevel, DoubleType)
  private lazy val sT: Expression = Cast(seedTrend, DoubleType)
  private lazy val lvl = AttributeReference("holt_level", DoubleType)()
  private lazy val trd = AttributeReference("holt_trend", DoubleType)()
  // effective previous state (see [[Ewma.prev]]): the buffer once any row
  // has run (lvl null ⇒ trd null, they update together), else the seeds
  private lazy val effL: Expression = If(IsNull(lvl), sL, lvl)
  private lazy val effT: Expression = If(IsNull(lvl), sT, trd)

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(lvl, trd)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType), Literal(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = {
    val newL = Add(Multiply(a, v),
      Multiply(Subtract(Literal(1.0), a), Add(effL, effT)))
    val newB = Add(Multiply(b, Subtract(newL, effL)),
      Multiply(Subtract(Literal(1.0), b), effT))
    Seq(
      If(IsNull(v), effL, If(IsNull(effL), v, newL)),
      If(IsNull(v), effT, If(IsNull(effL), Literal(0.0), newB)))
  }
  override lazy val evaluateExpression: Expression =
    If(IsNull(lvl), Literal(null, dataType),
      CreateNamedStruct(Seq(Literal("level"), lvl, Literal("trend"), trd)))

  override def prettyName: String = "holt_trend"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HoltTrend =
    copy(child = newChildren(0), alpha = newChildren(1), beta = newChildren(2),
      seedLevel = newChildren(3), seedTrend = newChildren(4))
}

/** Running variable-coefficient linear recurrence over ordered rows:
  * `acc = isnull(acc) ? bFirst : a·acc + bCont` — the carry chain of a
  * chunked linear smoother. [[graft.tsdb.TsAnalytics.ewmaSmooth]]'s
  * hot-series split computes per-chunk transit coefficients in parallel
  * and composes them per series with THIS fold over the tiny
  * |series|×|chunks| summary frame (rows are a handful of doubles, so
  * the per-series ordering that is pathological for point rows is free
  * here). Same incremental running-frame machinery as [[Ewma]]. */
case class ChainFold(a: Expression, bFirst: Expression, bCont: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(a, bFirst, bCont)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("chain_fold arguments must be numeric")

  private lazy val aD: Expression = Cast(a, DoubleType)
  private lazy val bFirstD: Expression = Cast(bFirst, DoubleType)
  private lazy val bContD: Expression = Cast(bCont, DoubleType)
  private lazy val acc = AttributeReference("chain_acc", DoubleType)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(acc)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(acc), bFirstD, Add(Multiply(aD, acc), bContD)))
  override lazy val evaluateExpression: Expression = acc

  override def prettyName: String = "chain_fold"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChainFold =
    copy(a = newChildren(0), bFirst = newChildren(1), bCont = newChildren(2))
}

/** Running 2×2 matrix power over ordered rows: each non-skip row
  * multiplies the accumulator (initialised to the identity) by the
  * CONSTANT matrix `[[m00, m01], [m10, m11]]`, so the j-th non-skip row
  * of a frame evaluates to `M^j` as a `struct(p00, p01, p10, p11)`.
  * Rows with `skip = true` (the virtual seed-zero rows of
  * [[graft.tsdb.TsAnalytics]]'s hot-series splits) leave the
  * accumulator untouched.
  *
  * Powers of one matrix commute, so left- vs right-multiplication is
  * immaterial. Used by the chunked Holt smoother: Holt's level/trend
  * recurrence is affine with a constant transition matrix M, and
  * reconstructing row j's state from a chunk seed s needs
  * `M^j·s + Q_j` — this native delivers `M^j` in the SAME running
  * window pass that delivers `Q_j`, O(1) per row. */
case class Mat2CumProd(skip: Expression, m00: Expression, m01: Expression,
    m10: Expression, m11: Expression) extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(skip, m00, m01, m10, m11)
  override def dataType: DataType = StructType(Seq(
    StructField("p00", DoubleType), StructField("p01", DoubleType),
    StructField("p10", DoubleType), StructField("p11", DoubleType)))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (skip.dataType != BooleanType)
      TypeCheckResult.TypeCheckFailure("mat2_cumprod skip flag must be boolean")
    else if (!children.tail.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckFailure("mat2_cumprod matrix entries must be numeric")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val Seq(a00, a01, a10, a11) =
    Seq(m00, m01, m10, m11).map(Cast(_, DoubleType): Expression)
  private lazy val p00 = AttributeReference("mat_p00", DoubleType)()
  private lazy val p01 = AttributeReference("mat_p01", DoubleType)()
  private lazy val p10 = AttributeReference("mat_p10", DoubleType)()
  private lazy val p11 = AttributeReference("mat_p11", DoubleType)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(p00, p01, p10, p11)
  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(1.0), Literal(0.0), Literal(0.0), Literal(1.0))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(skip, p00, Add(Multiply(a00, p00), Multiply(a01, p10))),
    If(skip, p01, Add(Multiply(a00, p01), Multiply(a01, p11))),
    If(skip, p10, Add(Multiply(a10, p00), Multiply(a11, p10))),
    If(skip, p11, Add(Multiply(a10, p01), Multiply(a11, p11))))
  override lazy val evaluateExpression: Expression = CreateNamedStruct(Seq(
    Literal("p00"), p00, Literal("p01"), p01,
    Literal("p10"), p10, Literal("p11"), p11))

  override def prettyName: String = "mat2_cumprod"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Mat2CumProd =
    copy(skip = newChildren(0), m00 = newChildren(1), m01 = newChildren(2),
      m10 = newChildren(3), m11 = newChildren(4))
}

/** 2-d analog of [[ChainFold]]: a running AFFINE recurrence over ordered
  * rows, `acc = isnull(acc) ? bFirst : A·acc + bCont` with a 2×2 matrix
  * `A = [[a00, a01], [a10, a11]]` per row and 2-vectors bFirst/bCont.
  * The carry chain of the chunked Holt smoother — composes per-chunk
  * transit maps `(M^m, Q_m)` into each chunk's outgoing (level, trend)
  * over the tiny |series|×|chunks| summary frame. Returns
  * `struct(l, t)`. */
case class ChainFold2(a00: Expression, a01: Expression, a10: Expression,
    a11: Expression, bFirstL: Expression, bFirstT: Expression,
    bContL: Expression, bContT: Expression) extends AggregateWindowFunction {

  override def children: Seq[Expression] =
    Seq(a00, a01, a10, a11, bFirstL, bFirstT, bContL, bContT)
  override def dataType: DataType = StructType(Seq(
    StructField("l", DoubleType), StructField("t", DoubleType)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("chain_fold2 arguments must be numeric")

  private lazy val Seq(c00, c01, c10, c11, bfL, bfT, bcL, bcT) =
    children.map(Cast(_, DoubleType): Expression)
  private lazy val accL = AttributeReference("chain2_l", DoubleType)()
  private lazy val accT = AttributeReference("chain2_t", DoubleType)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(accL, accT)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType), Literal(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(accL), bfL,
      Add(Add(Multiply(c00, accL), Multiply(c01, accT)), bcL)),
    If(IsNull(accL), bfT,
      Add(Add(Multiply(c10, accL), Multiply(c11, accT)), bcT)))
  override lazy val evaluateExpression: Expression =
    If(IsNull(accL), Literal(null, dataType),
      CreateNamedStruct(Seq(Literal("l"), accL, Literal("t"), accT)))

  override def prettyName: String = "chain_fold2"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChainFold2 =
    copy(a00 = newChildren(0), a01 = newChildren(1), a10 = newChildren(2),
      a11 = newChildren(3), bFirstL = newChildren(4), bFirstT = newChildren(5),
      bContL = newChildren(6), bContT = newChildren(7))
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
      orderBy: Seq[Column], seed: Option[Column] = None): Column = {
    val fn = Ewma(ColumnBridge.expression(value), Literal(alpha, DoubleType),
      seed.map(ColumnBridge.expression)
        .getOrElse(Literal(null, DoubleType)))
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(c => SortOrder(ColumnBridge.expression(c), Ascending)),
      fn.frame)
    ColumnBridge.column(WindowExpression(fn, spec))
  }

  /** `chain_fold(a, bFirst, bCont) OVER (…)` as a Column — see
    * [[ChainFold]]; same complete-WindowExpression construction as
    * [[ewma]]. */
  def chainFold(a: Column, bFirst: Column, bCont: Column,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = ChainFold(ColumnBridge.expression(a),
      ColumnBridge.expression(bFirst), ColumnBridge.expression(bCont))
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(c => SortOrder(ColumnBridge.expression(c), Ascending)),
      fn.frame)
    ColumnBridge.column(WindowExpression(fn, spec))
  }

  /** `mat2_cumprod(skip, m00, m01, m10, m11) OVER (…)` as a Column — see
    * [[Mat2CumProd]]; same complete-WindowExpression construction as
    * [[ewma]]. */
  def mat2CumProd(skip: Column, m00: Column, m01: Column, m10: Column,
      m11: Column, partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = Mat2CumProd(ColumnBridge.expression(skip),
      ColumnBridge.expression(m00), ColumnBridge.expression(m01),
      ColumnBridge.expression(m10), ColumnBridge.expression(m11))
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(c => SortOrder(ColumnBridge.expression(c), Ascending)),
      fn.frame)
    ColumnBridge.column(WindowExpression(fn, spec))
  }

  /** `chain_fold2(a00, a01, a10, a11, bFirstL, bFirstT, bContL, bContT)
    * OVER (…)` as a Column — see [[ChainFold2]]; same
    * complete-WindowExpression construction as [[ewma]]. */
  def chainFold2(a00: Column, a01: Column, a10: Column, a11: Column,
      bFirstL: Column, bFirstT: Column, bContL: Column, bContT: Column,
      partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    val fn = ChainFold2(ColumnBridge.expression(a00),
      ColumnBridge.expression(a01), ColumnBridge.expression(a10),
      ColumnBridge.expression(a11), ColumnBridge.expression(bFirstL),
      ColumnBridge.expression(bFirstT), ColumnBridge.expression(bContL),
      ColumnBridge.expression(bContT))
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
      partitionBy: Seq[Column], orderBy: Seq[Column],
      seed: Option[(Column, Column)] = None): Column = {
    val fn = HoltTrend(ColumnBridge.expression(value),
      Literal(alpha, DoubleType), Literal(beta, DoubleType),
      seed.map(s => ColumnBridge.expression(s._1))
        .getOrElse(Literal(null, DoubleType)),
      seed.map(s => ColumnBridge.expression(s._2))
        .getOrElse(Literal(null, DoubleType)))
    val spec = WindowSpecDefinition(
      partitionBy.map(ColumnBridge.expression),
      orderBy.map(c => SortOrder(ColumnBridge.expression(c), Ascending)),
      fn.frame)
    ColumnBridge.column(WindowExpression(fn, spec))
  }
}
