package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order-statistic quantiles with the reference's interpolation
  * conventions — polars' `nearest` / `lower` / `higher` / `midpoint` /
  * `linear` (transforms.py:238,279; stats.py:375). Spark's exact
  * `percentile` aggregate only implements `linear`, so the index-based
  * methods are computed from the two neighbouring order statistics.
  *
  * Shape: one count job, then one aggregation over the distinct-value
  * table with a running count. The running count is computed with
  * [[GlobalCumsum]] (range-partition + per-partition window + offset
  * merge) — every stage stays distributed no matter how many distinct
  * values the column has, unlike Spark's own exact `percentile`
  * aggregate, which buffers the whole value→count map in one reducer. */
object Quantiles {
  val methods = Set("nearest", "lower", "higher", "midpoint", "linear")

  /** Quantiles of the non-null values of `c` at fractions `qs`.
    * Returns NaN for an empty column. Rank for `nearest` rounds half
    * away from zero (Rust f64::round, what polars uses). */
  def exact(df: DataFrame, c: String, qs: Seq[Double],
            method: String): Seq[Double] = {
    require(methods(method), s"unknown quantile method '$method'")
    qs.foreach(q => require(q >= 0.0 && q <= 1.0,
      s"quantile fraction $q outside [0, 1]"))
    val P = "__gq_"
    val vals = df.select(col(c).cast("double").as(s"${P}v"))
      .where(col(s"${P}v").isNotNull)
    val n = vals.count()
    if (n == 0L) return qs.map(_ => Double.NaN)
    val idx = qs.map(_ * (n - 1))
    val ranks = idx.map { i =>
      method match {
        case "lower"   => (i.floor.toLong, i.floor.toLong)
        case "higher"  => (i.ceil.toLong, i.ceil.toLong)
        case "nearest" => val k = math.round(i); (k, k)
        case _         => (i.floor.toLong, i.ceil.toLong)
      }
    }
    val aggs = ranks.zipWithIndex.flatMap { case ((kLo, kHi), j) =>
      Seq(min(when(col(s"${P}cum") >= kLo + 1, col(s"${P}v")))
            .as(s"${P}lo$j"),
          min(when(col(s"${P}cum") >= kHi + 1, col(s"${P}v")))
            .as(s"${P}hi$j"))
    }
    // scopedValue: GlobalCumsum persists its range-partitioned
    // intermediate (registered at construction time, hence built
    // INSIDE the scope); this op ends in a driver value, so the blocks
    // are freed on the way out
    val row = Release.scopedValue(df.sparkSession) {
      val cum = GlobalCumsum.runningSums(
        vals.groupBy(s"${P}v").agg(count(lit(1)).as(s"${P}cnt")),
        col(s"${P}v"), ascending = true,
        Seq(col(s"${P}cnt") -> s"${P}cum"))
      cum.agg(aggs.head, aggs.tail: _*).head
    }
    idx.zip(ranks).zipWithIndex.map { case ((i, (kLo, _)), j) =>
      val lo = row.getDouble(2 * j)
      val hi = row.getDouble(2 * j + 1)
      method match {
        case "midpoint" => (lo + hi) / 2.0
        case "linear"   => lo + (i - kLo) * (hi - lo)
        case _          => lo
      }
    }
  }
}
