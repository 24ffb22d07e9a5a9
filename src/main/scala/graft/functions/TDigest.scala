package graft.functions

import java.nio.ByteBuffer

/** Merging t-digest (Dunning's algorithm, public domain design): a
  * mergeable quantile sketch with bounded size and accuracy concentrated
  * at the tails via the k1 scale function k(q) = (δ/2π)·asin(2q−1).
  * This mirrors the role of the t-digest the reference embeds in its
  * percentile aggregations (`iterator/agg_helpers.go:8-16`,
  * `iterator/multi_field_aggregator.go:81-85`) — small, mergeable,
  * accurate at p99.9 — without copying any implementation.
  */
final class TDigest(val compression: Double) extends Serializable {
  // sorted centroids after compress(); appends land in the tail buffer
  private var means = new Array[Double](32)
  private var weights = new Array[Double](32)
  private var n = 0 // centroid count (sorted prefix + unsorted tail)
  private var sorted = 0 // centroids in the sorted prefix
  var totalWeight: Double = 0.0
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  private def ensure(cap: Int): Unit =
    if (cap > means.length) {
      val m = java.util.Arrays.copyOf(means, math.max(cap, means.length * 2))
      val w = java.util.Arrays.copyOf(weights, m.length)
      means = m; weights = w
    }

  def add(x: Double, w: Double = 1.0): Unit = {
    if (x.isNaN) return
    ensure(n + 1)
    means(n) = x; weights(n) = w; n += 1
    totalWeight += w
    if (x < min) min = x
    if (x > max) max = x
    if (n - sorted > 256) compress()
  }

  def merge(other: TDigest): Unit = {
    var i = 0
    while (i < other.n) { add(other.means(i), other.weights(i)); i += 1 }
    compress()
  }

  /** k1 scale function k(q) = (δ/2π)·asin(2q−1): a centroid spanning
    * [qLo, qHi] is admissible while k(qHi) − k(qLo) ≤ 1. Given qLo this
    * returns the max admissible qHi = k⁻¹(k(qLo) + 1). */
  private def kLimit(qLo: Double): Double = {
    val q = math.max(0.0, math.min(1.0, qLo))
    val k = compression / (2 * math.Pi) * math.asin(2 * q - 1)
    val x = 2 * math.Pi * (k + 1) / compression
    if (x >= math.Pi / 2) 1.0 else (math.sin(x) + 1) / 2
  }

  def compress(): Unit = {
    if (n == 0) { sorted = 0; return }
    // sort all centroids by mean
    val idx = (0 until n).sortBy(means(_)).toArray
    val ms = idx.map(means(_)); val ws = idx.map(weights(_))
    var out = 0
    var i = 1
    var accumulated = 0.0 // weight fully emitted before current centroid
    means(0) = ms(0); weights(0) = ws(0)
    while (i < n) {
      val qLo = accumulated / totalWeight
      val qCeil = kLimit(qLo)
      val proposed = weights(out) + ws(i)
      if (accumulated + proposed <= totalWeight * qCeil + 1e-9 || weights(out) == 0) {
        // merge into current output centroid (weighted mean)
        val wsum = weights(out) + ws(i)
        means(out) = (means(out) * weights(out) + ms(i) * ws(i)) / wsum
        weights(out) = wsum
      } else {
        accumulated += weights(out)
        out += 1
        means(out) = ms(i); weights(out) = ws(i)
      }
      i += 1
    }
    n = out + 1
    sorted = n
  }

  /** Quantile by piecewise-linear interpolation across centroids, exact
    * at the recorded min/max. NaN when empty. */
  def quantile(q: Double): Double = {
    compress()
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val target = q * totalWeight
    if (target <= weights(0) / 2) {
      // interpolate min → first centroid
      return min + (means(0) - min) * math.min(1.0, target / (weights(0) / 2))
    }
    var cum = 0.0
    var i = 0
    while (i < n - 1) {
      val mid = cum + weights(i) / 2
      val nextMid = cum + weights(i) + weights(i + 1) / 2
      if (target >= mid && target < nextMid) {
        val f = (target - mid) / (nextMid - mid)
        return means(i) + f * (means(i + 1) - means(i))
      }
      cum += weights(i)
      i += 1
    }
    // tail: last centroid mid → max
    val lastMid = totalWeight - weights(n - 1) / 2
    if (target >= lastMid) {
      val f = math.min(1.0, (target - lastMid) / (weights(n - 1) / 2))
      math.min(max, means(n - 1) + f * (max - means(n - 1)))
    } else max
  }

  def serialize(): Array[Byte] = {
    compress()
    val buf = ByteBuffer.allocate(8 * 4 + 4 + n * 16)
    buf.putDouble(compression).putDouble(totalWeight).putDouble(min).putDouble(max)
    buf.putInt(n)
    var i = 0
    while (i < n) { buf.putDouble(means(i)); buf.putDouble(weights(i)); i += 1 }
    buf.array()
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val buf = ByteBuffer.wrap(bytes)
    val d = new TDigest(buf.getDouble)
    d.totalWeight = 0.0
    val tw = buf.getDouble; val mn = buf.getDouble; val mx = buf.getDouble
    val n = buf.getInt
    var i = 0
    while (i < n) {
      val m = buf.getDouble; val w = buf.getDouble
      d.add(m, w)
      i += 1
    }
    d.min = if (n == 0) Double.PositiveInfinity else math.min(d.min, mn)
    d.max = if (n == 0) Double.NegativeInfinity else math.max(d.max, mx)
    d.compress()
    d
  }
}
