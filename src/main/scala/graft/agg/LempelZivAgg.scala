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
    // the reference's dictionary parse (lempel_ziv.rs:18-31, the
    // tsfresh variant): grow a window until the substring is NEW, add
    // it, restart after it — complexity = number of distinct phrases.
    // (NOT the Kaspar–Schuster LZ76 scan, which counts differently:
    // 6 vs the reference's 8 on its own 16-bit test vector)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val sb = new StringBuilder
    var ind = 0
    var inc = 1
    while (ind + inc <= n) {
      sb.setLength(0)
      var i = ind
      while (i < ind + inc) { sb.append(if (s(i)) '1' else '0'); i += 1 }
      val sub = sb.toString
      if (seen.contains(sub)) inc += 1
      else { seen += sub; ind += inc; inc = 1 }
    }
    val c = seen.size
    if (asRatio) c.toDouble / n else c.toDouble
  }

  def bufferEncoder: Encoder[ArrayBuffer[(Long, Boolean)]] =
    Encoders.kryo[ArrayBuffer[(Long, Boolean)]]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object LempelZivAgg {
  // default as_ratio=true matches ts_features.py:314 query_lempel_ziv
  def lempelZiv(order: Column, bit: Column, asRatio: Boolean = true)
      : Column = {
    val f = functions.udaf(new LempelZivAgg(asRatio), Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaBoolean))
    f(order.cast("long"), bit.cast("boolean"))
  }
}
