package graft.agg

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** LZ76 complexity of an ordered boolean sequence (ts_features.py:314
  * query_lempel_ziv; kernel src/num_ext/lempel_ziv.rs:5). Inherently a
  * sequential scan → typed Aggregator buffering (order, bit) pairs and
  * sorting on finish; `as_ratio` divides by n. */
class LempelZivAgg(asRatio: Boolean)
    extends Aggregator[(Long, Boolean), ArrayBuffer[(Long, Boolean)], Double] {

  def zero: ArrayBuffer[(Long, Boolean)] = ArrayBuffer.empty
  def reduce(b: ArrayBuffer[(Long, Boolean)], a: (Long, Boolean))
      : ArrayBuffer[(Long, Boolean)] = { b += a; b }
  def merge(b1: ArrayBuffer[(Long, Boolean)], b2: ArrayBuffer[(Long, Boolean)])
      : ArrayBuffer[(Long, Boolean)] = { b1 ++= b2; b1 }

  def finish(buf: ArrayBuffer[(Long, Boolean)]): Double = {
    val s = buf.sortBy(_._1).map(_._2).toArray
    val n = s.length
    if (n == 0) return 0.0
    var (i, c, u, v, vmax) = (0, 1, 1, 1, 1)
    while (u + v <= n) {
      if (s(i + v - 1) == s(u + v - 1)) v += 1
      else {
        vmax = math.max(v, vmax)
        i += 1
        if (i == u) { c += 1; u += vmax; v = 1; i = 0; vmax = 1 }
        else v = 1
      }
    }
    if (v != 1) c += 1
    if (asRatio) c.toDouble / n else c.toDouble
  }

  def bufferEncoder: Encoder[ArrayBuffer[(Long, Boolean)]] =
    Encoders.kryo[ArrayBuffer[(Long, Boolean)]]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object LempelZivAgg {
  def lempelZiv(order: Column, bit: Column, asRatio: Boolean = false)
      : Column = {
    val f = functions.udaf(new LempelZivAgg(asRatio), Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaBoolean))
    f(order.cast("long"), bit.cast("boolean"))
  }
}
