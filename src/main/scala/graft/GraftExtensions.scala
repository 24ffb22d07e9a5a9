package graft

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL exposure of graft's native functions.
  *
  *  - `GraftFunctions.registerAll(spark)` — register on a live session;
  *  - `--conf spark.sql.extensions=graft.GraftExtensions` — inject at
  *    session build (cluster deployments, spark-sql shells).
  *
  * Functions: `vec_dot(a, b)`, `vec_cosine(a, b)`, `word_shingles(ws, n)`,
  * `winnow_hashes(ws, n, w)`, `compress_ratio(text)`,
  * `tdigest_percentile(x, q[, compression])`, `heavy_hitters(x, k)`,
  * `ewma(x, alpha) OVER (…)` (running-frame window aggregate).
  */
object GraftFunctions {

  private def litDouble(e: Expression, what: String): Double = e match {
    case Literal(v, _) if v != null => v.toString.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a literal number, got $other")
  }

  private def litInt(e: Expression, what: String): Int =
    litDouble(e, what).toInt

  /** Wrong-argument-count fails ANALYSIS with the expected signature
    * rather than surfacing a raw IndexOutOfBoundsException from an
    * es(n) access. */
  private def arity(n: Int, sig: String)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n) throw new IllegalArgumentException(
        s"expected $sig ($n arguments), got ${es.length}")
      b(es)
    }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> arity(2, "vec_dot(a, b)")(es => DotProduct(es(0), es(1))),
    "vec_cosine" -> arity(2, "vec_cosine(a, b)")(es =>
      CosineSimilarity(es(0), es(1))),
    "word_shingles" -> arity(2, "word_shingles(ws, n)")(es =>
      WordShingles(es(0), litInt(es(1), "shingle size"))),
    "winnow_hashes" -> arity(3, "winnow_hashes(ws, n, w)")(es =>
      WinnowHashes(es(0), litInt(es(1), "shingle size"), litInt(es(2), "window"))),
    "compress_ratio" -> arity(1, "compress_ratio(text)")(es =>
      CompressRatio(es(0))),
    "heavy_hitters" -> arity(2, "heavy_hitters(x, k)")(es =>
      HeavyHittersAgg(es(0), litInt(es(1), "k")).toAggregateExpression()),
    "tdigest_percentile" -> ((es: Seq[Expression]) => {
      if (es.length < 2 || es.length > 3) throw new IllegalArgumentException(
        s"expected tdigest_percentile(x, q[, compression]), got ${es.length} arguments")
      val q = litDouble(es(1), "quantile")
      val compression =
        if (es.length > 2) litDouble(es(2), "compression") else 100.0
      TDigestPercentileAgg(es(0), q, compression).toAggregateExpression()
    }),
    // window function: `ewma(x, alpha) OVER (PARTITION BY … ORDER BY …
    // ROWS UNBOUNDED PRECEDING)` — the analyzer adopts the function's
    // running row frame when the OVER clause leaves it unspecified
    "ewma" -> arity(2, "ewma(x, alpha)")(es => Ewma(es(0), es(1))),
    // `holt_trend(x, alpha, beta) OVER (…)` → struct(level, trend)
    "holt_trend" -> arity(3, "holt_trend(x, alpha, beta)")(es =>
      HoltTrend(es(0), es(1), es(2))))

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), b))
    }
    e.injectOptimizerRule(_ => graft.plans.TsPushdown)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
