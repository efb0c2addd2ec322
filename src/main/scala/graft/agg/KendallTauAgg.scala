package graft.agg

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Kendall τ-b as a typed Aggregator: buffers the group's (x,y) pairs,
  * finishes with the O(n log n) merge-sort inversion count — a Spark
  * re-expression of the reference kernel (src/stats/kendall_tau.rs:7,
  * 127 LoC, same algorithm as scipy.stats.kendalltau).
  *
  * Buffer = whole group (documented reference parity trade-off,
  * SURVEY §7 "hard parts"). For groups beyond ~10⁷ pairs prefer a
  * sampled estimate upstream; the aggregate itself merges partial
  * buffers associatively so partial aggregation still works.
  */
object KendallTauAgg extends Aggregator[(Double, Double),
    ArrayBuffer[(Double, Double)], Double] {

  def zero: ArrayBuffer[(Double, Double)] = ArrayBuffer.empty

  private def checkCap(len: Int): Unit = {
    val cap = java.lang.Long.getLong("graft.maxKendallSeries", 10000000L)
    require(len <= cap,
      s"KendallTauAgg: series of $len rows exceeds " +
        s"graft.maxKendallSeries=$cap — the whole group is buffered on " +
        "one task; sample the group upstream or raise the cap explicitly")
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

  def finish(buf: ArrayBuffer[(Double, Double)]): Double = {
    checkCap(buf.length)
    val n = buf.length
    if (n < 2) return Double.NaN
    val arr = buf.toArray.sortBy(p => (p._1, p._2))
    val nd = n.toDouble
    val tot = nd * (nd - 1) / 2
    // tie counts
    def tiePairs(runLens: Iterator[Int]): Double =
      runLens.map(t => t.toDouble * (t - 1) / 2).sum
    val xtie = tiePairs(runLengths(arr.iterator.map(_._1)))
    val ytie = tiePairs(runLengths(arr.iterator.map(_._2).toArray.sorted
      .iterator))
    val xytie = tiePairs(runLengths(arr.iterator.map(p => (p._1, p._2))))
    // discordant pairs = strict inversions of y in (x,y)-sorted order
    val ys = arr.map(_._2)
    val dis = countInversions(ys.clone(), new Array[Double](n), 0, n - 1)
    val conMinusDis = tot - xtie - ytie + xytie - 2.0 * dis
    val denom = math.sqrt((tot - xtie) * (tot - ytie))
    if (denom == 0) Double.NaN else conMinusDis / denom
  }

  private def runLengths[T](it: Iterator[T]): Iterator[Int] = new Iterator[Int] {
    private val i = it.buffered
    def hasNext: Boolean = i.hasNext
    def next(): Int = {
      val v = i.next(); var c = 1
      while (i.hasNext && i.head == v) { i.next(); c += 1 }
      c
    }
  }

  /** Merge sort counting strict inversions (a[i] > a[j], i < j). */
  private def countInversions(a: Array[Double], tmp: Array[Double],
                              lo: Int, hi: Int): Long = {
    if (lo >= hi) return 0L
    val mid = (lo + hi) >>> 1
    var inv = countInversions(a, tmp, lo, mid) +
      countInversions(a, tmp, mid + 1, hi)
    var (i, j, k) = (lo, mid + 1, lo)
    while (i <= mid && j <= hi) {
      if (a(i) <= a(j)) { tmp(k) = a(i); i += 1 }
      else { tmp(k) = a(j); j += 1; inv += mid - i + 1 }
      k += 1
    }
    while (i <= mid) { tmp(k) = a(i); i += 1; k += 1 }
    while (j <= hi) { tmp(k) = a(j); j += 1; k += 1 }
    System.arraycopy(tmp, lo, a, lo, hi - lo + 1)
    inv
  }

  def bufferEncoder: Encoder[ArrayBuffer[(Double, Double)]] =
    Encoders.kryo[ArrayBuffer[(Double, Double)]]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form for use in groupBy().agg(...). */
  def kendallTau(x: Column, y: Column): Column = {
    val f = functions.udaf(this, Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaDouble))
    f(x.cast("double"), y.cast("double"))
  }
}
