package graft.agg

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mann–Kendall trend test + Theil–Sen slope as one typed Aggregator
  * over a group's (t, x) series (Mann 1945; Kendall 1975; Sen 1968 —
  * all public literature; the reference has no trend-test surface, so
  * this is an LLM-pipeline/analytics addition in the house
  * KendallTauAgg style).
  *
  * Outputs per group: S = Σ_{i<j} sign(x_j − x_i) (time-ordered),
  * its tie-corrected variance, the continuity-corrected normal score
  * z, the Theil–Sen slope (median of all pairwise slopes) and Sen's
  * intercept (median of x − slope·t).
  *
  * None of it materializes the O(n²) pair set:
  *   - S needs the discordant-pair count = strict inversions of x in
  *     time order — one merge sort, O(n log n) (same kernel as
  *     [[KendallTauAgg]]).
  *   - The k-th smallest pairwise slope is found by BISECTING on the
  *     slope value m: #{pairs: slope ≤ m} = #{i<j: y_j ≤ y_i} for
  *     y = x − m·t (t strictly increasing makes the division safe),
  *     each count one merge sort — ≤ ~64 counts to the double
  *     fixed-point (the classic selection-by-counting scheme behind
  *     O(n log² n) Theil–Sen estimators, e.g. Cole–Salowe–Steiger–
  *     Szemerédi 1989). The converged bound is within 1 ULP of the
  *     true order statistic; callers that hash-compare against an
  *     oracle should round the slope (the house 6-dp convention).
  *
  * Buffer = whole group (the documented KendallTauAgg trade-off;
  * partials merge associatively so map-side combine still applies).
  * Times must be strictly increasing per group — duplicate t values
  * fail loud rather than silently biasing S. */
final case class TrendResult(s: Double, varS: Double, z: Double,
                             slope: Double, intercept: Double, n: Long)

object TrendAgg extends Aggregator[(Double, Double),
    ArrayBuffer[(Double, Double)], TrendResult] {

  def zero: ArrayBuffer[(Double, Double)] = ArrayBuffer.empty

  private def checkCap(len: Int): Unit = {
    val cap = java.lang.Long.getLong("graft.maxTrendSeries", 10000000L)
    require(len <= cap,
      s"TrendAgg: series of $len rows exceeds graft.maxTrendSeries=$cap" +
        " — the whole group is buffered on one task (O(n log² n) " +
        "selection); pre-aggregate/sample upstream or raise the cap " +
        "explicitly")
  }

  def reduce(b: ArrayBuffer[(Double, Double)], a: (Double, Double))
      : ArrayBuffer[(Double, Double)] = {
    if (!a._1.isNaN && !a._2.isNaN) {
      b += a
      // property lookup amortized: re-check every 8192 rows so a
      // runaway group fails at cap+8k, not at OOM
      if ((b.length & 8191) == 0) checkCap(b.length)
    }
    b
  }

  def merge(b1: ArrayBuffer[(Double, Double)],
            b2: ArrayBuffer[(Double, Double)])
      : ArrayBuffer[(Double, Double)] = {
    b1 ++= b2; checkCap(b1.length); b1
  }

  def finish(buf: ArrayBuffer[(Double, Double)]): TrendResult = {
    checkCap(buf.length)
    val n = buf.length
    if (n < 2)
      return TrendResult(Double.NaN, Double.NaN, Double.NaN, Double.NaN,
        Double.NaN, n.toLong)
    val pts = buf.toArray.sortBy(_._1)
    var i = 1
    while (i < n) {
      require(pts(i)._1 != pts(i - 1)._1,
        s"mann_kendall/theil_sen: duplicate time value ${pts(i)._1} — " +
          "times must be strictly increasing per group (aggregate or " +
          "jitter duplicate timestamps upstream)")
      i += 1
    }
    val ts = pts.map(_._1)
    val xs = pts.map(_._2)
    val nd = n.toDouble
    val tot = nd * (nd - 1) / 2.0
    // x tie runs (for S and var(S))
    val sortedX = xs.clone().sorted
    var tiePairs = 0.0
    var tieVar = 0.0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && sortedX(j) == sortedX(i)) j += 1
      val t = (j - i).toDouble
      tiePairs += t * (t - 1) / 2.0
      tieVar += t * (t - 1) * (2 * t + 5)
      i = j
    }
    val dis = countStrictInversions(xs.clone())
    val s = tot - tiePairs - 2.0 * dis
    val varS = (nd * (nd - 1) * (2 * nd + 5) - tieVar) / 18.0
    val z =
      if (varS <= 0) 0.0
      else if (s > 0) (s - 1.0) / math.sqrt(varS)
      else if (s < 0) (s + 1.0) / math.sqrt(varS)
      else 0.0
    // Theil–Sen: median of the n(n−1)/2 pairwise slopes by selection
    val np = (n.toLong * (n - 1)) / 2
    val slope =
      if (np % 2 == 1) kthSlope(ts, xs, (np + 1) / 2)
      else (kthSlope(ts, xs, np / 2) + kthSlope(ts, xs, np / 2 + 1)) / 2.0
    // Sen's intercept: median of the residual levels
    val levels = Array.tabulate(n)(k => xs(k) - slope * ts(k)).sorted
    val intercept =
      if (n % 2 == 1) levels(n / 2)
      else (levels(n / 2 - 1) + levels(n / 2)) / 2.0
    TrendResult(s, varS, z, slope, intercept, n.toLong)
  }

  /** #{pairs i<j with x(j) < x(i)} via merge sort (strict). */
  private def countStrictInversions(a: Array[Double]): Long = {
    val tmp = new Array[Double](a.length)
    def rec(lo: Int, hi: Int): Long = {
      if (lo >= hi) return 0L
      val mid = (lo + hi) >>> 1
      var cnt = rec(lo, mid) + rec(mid + 1, hi)
      var l = lo; var r = mid + 1; var k = lo
      while (l <= mid && r <= hi) {
        if (a(r) < a(l)) { cnt += (mid - l + 1); tmp(k) = a(r); r += 1 }
        else { tmp(k) = a(l); l += 1 }
        k += 1
      }
      while (l <= mid) { tmp(k) = a(l); l += 1; k += 1 }
      while (r <= hi) { tmp(k) = a(r); r += 1; k += 1 }
      System.arraycopy(tmp, lo, a, lo, hi - lo + 1)
      cnt
    }
    rec(0, a.length - 1)
  }

  /** #{pairs i<j (time order) with slope ≤ m} = non-strict inversions
    * of y = x − m·t. */
  private def countSlopesLE(ts: Array[Double], xs: Array[Double],
                            m: Double): Long = {
    val n = ts.length
    val y = Array.tabulate(n)(k => xs(k) - m * ts(k))
    val tmp = new Array[Double](n)
    def rec(lo: Int, hi: Int): Long = {
      if (lo >= hi) return 0L
      val mid = (lo + hi) >>> 1
      var cnt = rec(lo, mid) + rec(mid + 1, hi)
      var l = lo; var r = mid + 1; var k = lo
      while (l <= mid && r <= hi) {
        if (y(r) <= y(l)) { cnt += (mid - l + 1); tmp(k) = y(r); r += 1 }
        else { tmp(k) = y(l); l += 1 }
        k += 1
      }
      while (l <= mid) { tmp(k) = y(l); l += 1; k += 1 }
      while (r <= hi) { tmp(k) = y(r); r += 1; k += 1 }
      System.arraycopy(tmp, lo, y, lo, hi - lo + 1)
      cnt
    }
    rec(0, n - 1)
  }

  /** k-th smallest pairwise slope (1-based) by bisection to the
    * double fixed point. */
  private def kthSlope(ts: Array[Double], xs: Array[Double],
                       k: Long): Double = {
    var xMin = Double.MaxValue; var xMax = Double.MinValue
    var dtMin = Double.MaxValue
    var i = 0
    while (i < xs.length) {
      if (xs(i) < xMin) xMin = xs(i)
      if (xs(i) > xMax) xMax = xs(i)
      if (i > 0 && ts(i) - ts(i - 1) < dtMin) dtMin = ts(i) - ts(i - 1)
      i += 1
    }
    val bound = if (xMax == xMin) 0.0 else (xMax - xMin) / dtMin
    if (bound == 0.0) return 0.0 // all x equal: every slope is 0
    var lo = -bound; var hi = bound
    // invariant: countLE(lo) < k ≤ countLE(hi)
    if (countSlopesLE(ts, xs, lo) >= k) return lo
    var iter = 0
    while (iter < 128) {
      val mid = lo / 2 + hi / 2 // overflow-safe midpoint
      if (mid <= lo || mid >= hi) return hi
      if (countSlopesLE(ts, xs, mid) >= k) hi = mid else lo = mid
      iter += 1
    }
    hi
  }

  def bufferEncoder: Encoder[ArrayBuffer[(Double, Double)]] =
    Encoders.kryo[ArrayBuffer[(Double, Double)]]
  def outputEncoder: Encoder[TrendResult] = Encoders.product[TrendResult]

  /** Column form: struct{s, varS, z, slope, intercept, n}. */
  def trend(t: org.apache.spark.sql.Column,
            x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val f = org.apache.spark.sql.functions.udaf(this, Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaDouble))
    f(t.cast("double"), x.cast("double"))
  }
}
