package graft.tsdb

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's aggregation function set (`core/query.go:5-15` plus the
  * iterator-implemented frac/stddev/percentiles), as Spark `Column`
  * aggregate expressions with the reference's exact empty-set / NaN
  * semantics (`iterator/multi_field_aggregator.go:244-304`):
  *
  *  - count: non-null values of ANY type (strings/bools count too) → 0 when empty
  *  - sum: 0 when empty; avg/min/max/first/last/frac/stddev/p<N>: NaN when empty
  *  - first/last: first/last NUMERIC value in (timestamp asc, seq desc) order
  *  - frac: (last−first)/first, 0 when both 0, ±Inf when first=0, NaN when <2 values
  *  - stddev: SAMPLE stddev, NaN when <2 values
  *  - int64 inputs promoted to float64; NaN/Inf inputs skipped (the A1
  *    behavior at `multi_field_aggregator.go:57-59`, adopted uniformly —
  *    the A2 divergence is documented in SURVEY §2.4 and NOT copied).
  */
object AggFunctions {
  val nan: Column = lit(Double.NaN)

  /** All function names (percentiles are dynamic `p<N>`). */
  val named: Set[String] =
    Set("count", "sum", "avg", "min", "max", "first", "last", "frac", "stddev")

  /** Build the aggregate Column for one spec.
    *
    * @param numeric cleaned numeric value of the field: double, int64
    *                promoted, NaN/±Inf already mapped to null
    * @param anyNonNull 1 when the field has a non-null value of any type, else null
    * @param vord    NULL-GATED ordering struct for first/last: the
    *                (timestamp asc, seq desc) stream-ord struct when the
    *                field's numeric value is non-null, else null (r18 —
    *                was an ungated struct gated here per use; callers now
    *                pass `when(numeric.isNotNull, ord)` or a materialized
    *                column of it, so aggregates with several first/last
    *                specs evaluate the gate once per row, not per spec)
    */
  def build(spec: AggSpec, numeric: Column, anyNonNull: Column, vord: Column): Column = {
    val n = numeric
    val result: Column = spec.func match {
      case "count" if spec.field == "*" => count(lit(1))
      case "count" => count(anyNonNull)
      case "sum"   => coalesce(sum(n), lit(0.0))
      case "avg"   => coalesce(avg(n), nan)
      case "min"   => coalesce(min(n), nan)
      case "max"   => coalesce(max(n), nan)
      case "first" => coalesce(min_by(n, vord), nan)
      case "last"  => coalesce(max_by(n, vord), nan)
      case "frac"  => fracExpr(n, vord)
      case "stddev" => coalesce(stddev_samp(n), nan)
      case p => spec.percentile match {
        case Some(q) => coalesce(percentile(n, lit(q / 100.0)), nan)
        case None => throw new IllegalArgumentException(s"unknown aggregation function: $p")
      }
    }
    result.as(spec.outputName)
  }

  /** frac = (last − first) / first over numeric values in stream order
    * (`multi_field_aggregator.go:279-292`). */
  private def fracExpr(n: Column, vord: Column): Column = {
    val cnt = count(n)
    val fst = min_by(n, vord)
    val lst = max_by(n, vord)
    // divisor guarded with null (not 0) so ANSI mode can never raise
    // DIVIDE_BY_ZERO even when subexpression elimination hoists the divide
    when(cnt < 2, nan)
      .when(fst === 0.0 && lst === 0.0, lit(0.0))
      .when(fst === 0.0 && lst > 0.0, lit(Double.PositiveInfinity))
      .when(fst === 0.0 && lst < 0.0, lit(Double.NegativeInfinity))
      .otherwise((lst - fst) / when(fst =!= 0.0, fst))
  }

  /** Clean numeric view of a raw double column: NaN/±Inf → null so
    * aggregates skip them (`multi_field_aggregator.go:57-59`). */
  def cleanNumeric(raw: Column): Column =
    when(isnan(raw) || raw === Double.PositiveInfinity ||
         raw === Double.NegativeInfinity, lit(null).cast("double"))
      .otherwise(raw)
}
