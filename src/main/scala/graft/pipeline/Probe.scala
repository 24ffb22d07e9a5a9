package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable linear quality probe — the missing step between the cheap
  * heuristic filters ([[TextAnalysis.qualityScore]]) and an external
  * model service: fit a ridge-regression probe over document features IN
  * ONE DISTRIBUTED PASS (CCNet/fastText-style linear quality classifiers
  * are the standard pre-filter for LLM corpora), then score the corpus
  * with pure codegen Column algebra.
  *
  * Scale shape: training reduces the corpus to the (k+1)×(k+1) Gram
  * matrix of the feature vector — all plain `sum()` aggregates, map-side
  * combined, whole-stage codegen, ONE driver row regardless of corpus
  * size — and the k×k solve happens on the driver (k is tiny: doc
  * quality features, not embeddings). Scoring is a broadcast-free linear
  * combination with literal weights. Nothing here is per-row driver
  * work; a 100 TB corpus trains in exactly one scan.
  */
object Probe {

  /** The standard cheap quality features as SQL-reproducible columns:
    * length saturation `min(n_tokens/100, 1)`, lexical diversity
    * `n_uniq/n_tokens`, and stopword density — the same signals
    * [[TextAnalysis.qualityScore]] hard-codes with fixed weights, here
    * exposed as a feature vector the probe can LEARN weights for.
    * Token-free text yields all-zero features. */
  def docFeatures(text: Column): Seq[Column] = {
    val ws = TextAnalysis.words(text)
    val nTok = size(ws).cast("double")
    val lenSat = least(nTok / 100.0, lit(1.0))
    val divers = size(array_distinct(ws)).cast("double") / when(nTok =!= 0.0, nTok)
    val stopR = TextAnalysis.stopHits(ws, "en").cast("double") / when(nTok =!= 0.0, nTok)
    Seq(coalesce(lenSat, lit(0.0)), coalesce(divers, lit(0.0)),
      coalesce(stopR, lit(0.0)))
  }

  /** One-row sufficient statistics of the regression: `n`, the upper
    * triangle of the Gram matrix `g_ij = Σ xᵢxⱼ` over the
    * intercept-extended feature vector `x = (1, f₁..fₖ)`, and the moment
    * vector `b_i = Σ xᵢ·y`. This IS the training scan — [[fitRidge]]
    * solves from it — exposed separately so the statistics themselves
    * can be checked against an external oracle. */
  def gramMoments(df: DataFrame, features: Seq[Column], label: Column): DataFrame = {
    val x = lit(1.0) +: features
    val k = x.length
    val gram = for (i <- 0 until k; j <- i until k)
      yield sum(x(i) * x(j)).as(s"g$i$j")
    val mom = for (i <- 0 until k) yield sum(x(i) * label).as(s"b$i")
    df.agg(count(lit(1)).as("n"), (gram ++ mom): _*)
  }

  /** Closed-form ridge regression `(G + λI)w = b` (λ not applied to the
    * intercept). Returns `[w₀ (intercept), w₁..wₖ]`. One aggregation
    * scan + a k×k driver solve (Gaussian elimination, partial pivoting).
    * λ=0 is exact least squares — it throws if the features are
    * collinear; any positive λ regularizes that away. */
  def fitRidge(df: DataFrame, features: Seq[Column], label: Column,
      lambda: Double = 1e-6): Array[Double] = {
    require(lambda >= 0, "ridge lambda must be non-negative")
    val k = features.length + 1
    val row = gramMoments(df, features, label).head()
    require(row.getLong(0) > 0, "cannot fit a probe on an empty corpus")
    val a = Array.ofDim[Double](k, k)
    var idx = 1
    for (i <- 0 until k; j <- i until k) {
      a(i)(j) = row.getDouble(idx); a(j)(i) = a(i)(j); idx += 1
    }
    val b = Array.tabulate(k)(i => row.getDouble(idx + i))
    for (i <- 1 until k) a(i)(i) += lambda
    solve(a, b)
  }

  /** Linear score `w₀ + Σ wᵢ·fᵢ` as a single codegen expression. */
  def score(features: Seq[Column], weights: Array[Double]): Column = {
    require(weights.length == features.length + 1,
      s"expected ${features.length + 1} weights (intercept first), got ${weights.length}")
    features.zipWithIndex.foldLeft(lit(weights(0)): Column) {
      case (acc, (f, i)) => acc + f * lit(weights(i + 1))
    }
  }

  /** In-place Gaussian elimination with partial pivoting. */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    for (c <- 0 until n) {
      var p = c
      for (r <- c + 1 until n) if (math.abs(a(r)(c)) > math.abs(a(p)(c))) p = r
      if (p != c) { val t = a(p); a(p) = a(c); a(c) = t
        val tb = b(p); b(p) = b(c); b(c) = tb }
      require(math.abs(a(c)(c)) > 1e-12,
        "singular normal equations — collinear features; use lambda > 0")
      for (r <- c + 1 until n) {
        val m = a(r)(c) / a(c)(c)
        if (m != 0.0) {
          for (cc <- c until n) a(r)(cc) -= m * a(c)(cc)
          b(r) -= m * b(c)
        }
      }
    }
    val w = new Array[Double](n)
    for (c <- n - 1 to 0 by -1) {
      var s = b(c)
      for (cc <- c + 1 until n) s -= a(c)(cc) * w(cc)
      w(c) = s / a(c)(c)
    }
    w
  }
}
