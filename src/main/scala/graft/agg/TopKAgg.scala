package graft.agg

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate: keeps the k largest (score, id) pairs per
  * group, ties broken toward the smaller id (deterministic, matching a
  * `ROW_NUMBER() OVER (ORDER BY score DESC, id)` oracle).
  *
  * The scale point: a per-group top-k via window `row_number` sorts and
  * shuffles EVERY row of the group; this Aggregator's partial state is
  * at most k pairs, so map-side combine reduces each partition to k
  * rows per group before the exchange — shuffle volume k·partitions
  * per group instead of the group size. Same pattern cosineTopK uses
  * for ANN, generalized to any (score, id) ranking.
  *
  * Buffer is a plain ArrayBuffer kept sorted (insertion into a ≤k
  * array — for ranking-sized k this beats heap constant factors and
  * keeps merge a linear two-pointer pass). */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), ArrayBuffer[(Double, Long)],
      Seq[(Double, Long)]] {
  require(k > 0, "TopKAgg: k must be positive")

  // (a beats b) in the ranking: higher score first, then smaller id
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def zero: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  def reduce(b: ArrayBuffer[(Double, Long)],
             in: (Double, Long)): ArrayBuffer[(Double, Long)] = {
    if (!in._1.isNaN) {
      if (b.length < k || beats(in, b.last)) {
        var i = b.length
        b.append(in) // placeholder; shift into sorted position
        while (i > 0 && beats(in, b(i - 1))) { b(i) = b(i - 1); i -= 1 }
        b(i) = in
        if (b.length > k) b.remove(b.length - 1)
      }
    }
    b
  }

  def merge(x: ArrayBuffer[(Double, Long)],
            y: ArrayBuffer[(Double, Long)])
      : ArrayBuffer[(Double, Long)] = {
    val out = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    var j = 0
    while (out.length < k && (i < x.length || j < y.length)) {
      if (j >= y.length || (i < x.length && beats(x(i), y(j)))) {
        out.append(x(i)); i += 1
      } else { out.append(y(j)); j += 1 }
    }
    out
  }

  def finish(b: ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] = b.toSeq

  def bufferEncoder: Encoder[ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[ArrayBuffer[(Double, Long)]]
  def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Double, Long)]]()
}
