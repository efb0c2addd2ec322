package graft.agg

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Dynamic-time-warping distance from each group's ordered series to a
  * fixed query pattern (template matching over keyed telemetry: "which
  * series trace this shape?"). Inherently a sequential DP → typed
  * Aggregator buffering (order, value) pairs, sorting on finish, then
  * the classic O(n·m) two-row DP with the symmetric step pattern
  *   D(i,j) = cost(i,j) + min(D(i-1,j), D(i,j-1), D(i-1,j-1)),
  * cost = |x_i - y_j|^p. An optional Sakoe-Chiba band constrains
  * |j - i·m/n| <= band (in pattern steps, after slope normalization);
  * band < 0 means unconstrained. Series length is capped LOUDLY at
  * `graft.maxDtwSeries` (default 100k — the buffer is one group's
  * series on one executor, and DP time is n·m; pick patterns small). */
class DtwAgg(pattern: Array[Double], band: Int, costPow: Double)
    extends Aggregator[(Long, Double), ArrayBuffer[(Long, Double)], Double] {

  def zero: ArrayBuffer[(Long, Double)] = ArrayBuffer.empty
  def reduce(b: ArrayBuffer[(Long, Double)], a: (Long, Double))
      : ArrayBuffer[(Long, Double)] = { b += a; b }
  def merge(b1: ArrayBuffer[(Long, Double)], b2: ArrayBuffer[(Long, Double)])
      : ArrayBuffer[(Long, Double)] = { b1 ++= b2; b1 }

  def finish(buf: ArrayBuffer[(Long, Double)]): Double = {
    val cap = java.lang.Long.getLong("graft.maxDtwSeries", 100000L)
    require(buf.length <= cap,
      s"DtwAgg: series of ${buf.length} rows exceeds graft.maxDtwSeries" +
        s"=$cap; DP cost is series*pattern — pre-aggregate or raise the" +
        " cap explicitly")
    val xs = buf.sortBy(_._1).map(_._2).toArray
    val n = xs.length
    val m = pattern.length
    if (n == 0) return Double.NaN
    val inf = Double.PositiveInfinity
    var prev = Array.fill(m + 1)(inf)
    var cur = Array.fill(m + 1)(inf)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      // slope-normalized band center for row i
      val cj = i.toDouble * m / n
      val lo = if (band < 0) 1 else math.max(1, math.ceil(cj - band).toInt)
      val hi = if (band < 0) m else math.min(m, math.floor(cj + band).toInt)
      var j = lo
      while (j <= hi) {
        val c = math.pow(math.abs(xs(i - 1) - pattern(j - 1)), costPow)
        val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        cur(j) = c + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  def bufferEncoder: Encoder[ArrayBuffer[(Long, Double)]] =
    Encoders.kryo[ArrayBuffer[(Long, Double)]]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object DtwAgg {
  /** DTW distance aggregate of the (order, value) series to `pattern`.
    * `band` < 0 = unconstrained; `costPow` 1.0 = L1 point cost,
    * 2.0 = squared (take sqrt outside for the L2 DTW norm). */
  def dtw(order: Column, value: Column, pattern: Seq[Double],
          band: Int = -1, costPow: Double = 1.0): Column = {
    require(pattern.nonEmpty, "DtwAgg: empty pattern")
    val f = functions.udaf(new DtwAgg(pattern.toArray, band, costPow),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    f(order.cast("long"), value.cast("double"))
  }
}
