package graft.agg

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Harrell's concordance index (C-index) for survival predictions —
  * the rank-based goodness-of-fit companion to [[graft.ops.SurvOps]]'
  * Cox regression: over usable pairs (t_i < t_j with subject i's event
  * OBSERVED; equal event times are not usable — Harrell's original
  * convention, documented), a pair is concordant when the
  * earlier-failing subject has the HIGHER risk score; tied risks count
  * 1/2. Computed in O(n log n), not O(n^2): subjects are processed in
  * descending event-time order, tie-block at a time, against a Fenwick
  * tree over risk ranks of the already-processed (later-time) subjects
  * — the same inversion-counting idea as KendallTauAgg. Returns a
  * struct {c_index, n_pairs}. Series length is capped LOUDLY at
  * `graft.maxCindexSeries` (default 10M rows buffered per group). */
class ConcordanceAgg
    extends Aggregator[(Double, Boolean, Double),
      ArrayBuffer[(Double, Boolean, Double)], (Double, Long)] {

  def zero: ArrayBuffer[(Double, Boolean, Double)] = ArrayBuffer.empty
  def reduce(b: ArrayBuffer[(Double, Boolean, Double)],
             a: (Double, Boolean, Double))
      : ArrayBuffer[(Double, Boolean, Double)] = { b += a; b }
  def merge(b1: ArrayBuffer[(Double, Boolean, Double)],
            b2: ArrayBuffer[(Double, Boolean, Double)])
      : ArrayBuffer[(Double, Boolean, Double)] = { b1 ++= b2; b1 }

  def finish(buf: ArrayBuffer[(Double, Boolean, Double)])
      : (Double, Long) = {
    val cap = java.lang.Long.getLong("graft.maxCindexSeries", 10000000L)
    require(buf.length <= cap,
      s"ConcordanceAgg: group of ${buf.length} rows exceeds " +
        s"graft.maxCindexSeries=$cap — pre-aggregate or raise the cap")
    val n = buf.length
    if (n == 0) return (Double.NaN, 0L)
    // rank-compress the risk scores for the Fenwick tree
    val rows = buf.toArray
    val risks = rows.map(_._3).distinct.sorted
    val rankOf = risks.zipWithIndex.toMap
    val m = risks.length
    val tree = new Array[Long](m + 1)
    def add(i0: Int): Unit = {
      var i = i0 + 1
      while (i <= m) { tree(i) += 1; i += i & -i }
    }
    def cumLt(i0: Int): Long = { // count of inserted ranks < i0
      var i = i0; var s = 0L
      while (i > 0) { s += tree(i); i -= i & -i }
      s
    }
    val byTimeDesc = rows.sortBy(r => (-r._1, r._3))
    var inserted = 0L
    var num = 0.0
    var pairs = 0L
    var i = 0
    while (i < n) {
      var j = i // tie block [i, j) shares the event time
      while (j < n && byTimeDesc(j)._1 == byTimeDesc(i)._1) j += 1
      var k = i
      while (k < j) { // events in this block pair with LATER times only
        val (_, ev, r) = byTimeDesc(k)
        if (ev) {
          val rk = rankOf(r)
          val lt = cumLt(rk) // later subjects with smaller risk
          val le = cumLt(rk + 1)
          val eq = le - lt
          num += lt + 0.5 * eq
          pairs += inserted
        }
        k += 1
      }
      k = i
      while (k < j) { add(rankOf(byTimeDesc(k)._3)); k += 1 }
      inserted += (j - i)
      i = j
    }
    (if (pairs == 0L) Double.NaN else num / pairs, pairs)
  }

  def bufferEncoder: Encoder[ArrayBuffer[(Double, Boolean, Double)]] =
    Encoders.kryo[ArrayBuffer[(Double, Boolean, Double)]]
  def outputEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
}

object ConcordanceAgg {
  /** C-index aggregate of (time, event, risk) — struct output
    * {_1: c_index, _2: n_pairs}. Higher risk failing earlier =
    * concordant. */
  def cIndex(time: Column, event: Column, risk: Column): Column = {
    val f = functions.udaf(new ConcordanceAgg, Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaBoolean,
      Encoders.scalaDouble))
    f(time.cast("double"), event.cast("boolean"), risk.cast("double"))
  }
}
