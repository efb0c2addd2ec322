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

  /** The two neighbouring order statistics backing one quantile: the
    * final value is [[interp]] of these. Exposing the raw pair lets
    * callers apply any order-preserving per-value transform (e.g. a
    * winsorize clip) BEFORE interpolation — exactly what evaluating
    * the quantile on the transformed data would produce, since a
    * monotone map commutes with order statistics elementwise. */
  final case class Raw(lo: Double, hi: Double, idx: Double, kLo: Long,
                       method: String) {
    def interp: Double = method match {
      case "midpoint" => (lo + hi) / 2.0
      case "linear"   => lo + (idx - kLo) * (hi - lo)
      case _          => lo
    }
    def mapped(f: Double => Double): Raw = copy(lo = f(lo), hi = f(hi))
  }

  /** Quantiles of the non-null values of `c` at fractions `qs`.
    * Returns NaN for an empty column. Rank for `nearest` rounds half
    * away from zero (Rust f64::round, what polars uses). */
  def exact(df: DataFrame, c: String, qs: Seq[Double],
            method: String): Seq[Double] =
    exactRaw(df, c, qs.map(q => (q, method))).map(_.interp)

  /** One distributed pass serving MULTIPLE (fraction, method) requests
    * on the same column — one count job + one GlobalCumsum + one
    * aggregation regardless of how many quantiles are asked for.
    * Returns the raw order-statistic pairs ([[Raw]]); `.interp` gives
    * the quantile value. */
  def exactRaw(df: DataFrame, c: String,
               entries: Seq[(Double, String)]): Seq[Raw] = {
    entries.foreach { case (q, method) =>
      require(methods(method), s"unknown quantile method '$method'")
      require(q >= 0.0 && q <= 1.0, s"quantile fraction $q outside [0, 1]")
    }
    val P = "__gq_"
    val vals = df.select(col(c).cast("double").as(s"${P}v"))
      .where(col(s"${P}v").isNotNull)
    val n = vals.count()
    if (n == 0L)
      return entries.map { case (_, m) =>
        Raw(Double.NaN, Double.NaN, 0.0, 0L, m)
      }
    val idx = entries.map { case (q, _) => q * (n - 1) }
    val ranks = idx.zip(entries).map { case (i, (_, method)) =>
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
    idx.zip(ranks).zip(entries).zipWithIndex.map {
      case (((i, (kLo, _)), (_, method)), j) =>
        Raw(row.getDouble(2 * j), row.getDouble(2 * j + 1), i, kLo,
          method)
    }
  }
}
