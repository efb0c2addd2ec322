package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PValues

/** Trend / serial-correlation diagnostics over keyed time series —
  * analytics additions beyond the reference surface (which has no
  * trend-test rows), in the house per-group-window style: every
  * window below is partitioned by the group key, so no stage ever
  * collapses to one task regardless of row count.
  */
object TrendOps {

  private val P = "__trend_"

  /** Mann–Kendall trend test + Theil–Sen slope per group:
    * {s, var_s, z, pvalue, slope, intercept, n}. Statistic and slope
    * come from [[graft.agg.TrendAgg]] (O(n log n) per group, no pair
    * materialization); the two-sided p uses the continuity-corrected
    * normal approximation, the standard reference for n ≳ 10. */
  def mannKendall(df: DataFrame, t: Column, x: Column,
                  groupNames: Seq[String]): DataFrame = {
    val gc = groupNames.map(col)
    val r = df.groupBy(gc: _*)
      .agg(graft.agg.TrendAgg.trend(t, x).as(s"${P}r"))
    r.select(gc ++ Seq(
      col(s"${P}r.s").as("s"),
      col(s"${P}r.varS").as("var_s"),
      col(s"${P}r.z").as("z"),
      PValues.normSf2(abs(col(s"${P}r.z"))).as("pvalue"),
      col(s"${P}r.slope").as("slope"),
      col(s"${P}r.intercept").as("intercept"),
      col(s"${P}r.n").as("n")): _*)
  }

  /** Durbin–Watson statistic per group, series ordered by `t`:
    * DW = Σ(e_i − e_{i−1})² / Σ e_i² ∈ [0, 4] (2 ≈ no serial
    * correlation). One keyed lag window + one aggregation. */
  def durbinWatson(df: DataFrame, t: Column, e: Column,
                   groupNames: Seq[String]): DataFrame = {
    val gc = groupNames.map(col)
    val w = Window.partitionBy(gc: _*).orderBy(t)
    val withLag = df
      .select(gc :+ t.as(s"${P}t") :+ e.cast("double").as(s"${P}e"): _*)
      .withColumn(s"${P}d",
        col(s"${P}e") - lag(s"${P}e", 1).over(
          Window.partitionBy(gc: _*).orderBy(col(s"${P}t"))))
    withLag.groupBy(gc: _*)
      .agg((sum(col(s"${P}d") * col(s"${P}d")) /
        sum(col(s"${P}e") * col(s"${P}e"))).as("dw"),
        count(col(s"${P}e")).as("n"))
  }

  /** Exponentially weighted moving mean over a FINITE window of the
    * last `span` observations per group (ordered by `t`):
    * ewm_i = Σ_{k=0..span−1} (1−α)^k·x_{i−k} / Σ (1−α)^k over the
    * lags that exist (the adjust=true normalization, truncated).
    *
    * The truncation is the scale decision: an infinite-memory EWMA is
    * inherently sequential (state threads through every row), while
    * the truncated form is a fixed linear combination of `span` lags
    * — one keyed window, codegen'd, embarrassing-parallel across
    * groups, and the dropped tail carries weight (1−α)^span (< 1e-9
    * for the default span when α ≥ 0.5). Callers pick span to bound
    * the error, exactly like a truncated convolution kernel. */
  def ewmMean(df: DataFrame, t: Column, x: Column, alpha: Double,
              span: Int, groupNames: Seq[String],
              outName: String = "ewm"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"ewmMean: alpha must be in (0,1], got $alpha")
    require(span >= 1 && span <= 256,
      s"ewmMean: span must be in [1,256], got $span (larger spans " +
        "belong in a convolution — see SeqOps.convolve)")
    val gc = groupNames.map(col)
    val w = Window.partitionBy(gc: _*).orderBy(t)
    val base = df.select(gc :+ t.as(s"${P}t")
      :+ x.cast("double").as(s"${P}x"): _*)
    val terms = (0 until span).map { k =>
      val wt = math.pow(1.0 - alpha, k)
      val lagged =
        if (k == 0) col(s"${P}x")
        else lag(s"${P}x", k).over(
          Window.partitionBy(gc: _*).orderBy(col(s"${P}t")))
      (lagged * wt, when(lagged.isNotNull, wt).otherwise(0.0))
    }
    val num = terms.map(p => coalesce(p._1, lit(0.0))).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    base.withColumn(outName, num / den)
  }

  /** Brown's double exponential smoothing (linear-trend forecast) per
    * group, on the same span-truncated head-normalized EWM contract as
    * [[ewmMean]]: s1 = ewm(x), s2 = ewm(s1) (both span-truncated, each
    * normalized by its available-weight sum), then per row
    *   level    = 2 s1 - s2,
    *   trend    = alpha/(1-alpha) * (s1 - s2),
    *   forecast = level + h * trend     (the h-step-ahead prediction).
    * Truncation tail weight is (1-alpha)^span of the geometric total —
    * the [[ewmMean]] contract; for exact-to-machine-precision output
    * size span so (1-alpha)^span < 1e-16. Two nested keyed lag
    * windows, embarrassingly parallel across groups, no recursion.
    * Returns the input columns plus {level, trend, forecast}. */
  def brownDouble(df: DataFrame, t: Column, x: Column, alpha: Double,
                  span: Int, h: Int,
                  groupNames: Seq[String]): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0,
      s"brownDouble: alpha must be in (0,1), got $alpha")
    require(span >= 2 && span <= 256,
      s"brownDouble: span must be in [2,256], got $span")
    require(h >= 0, s"brownDouble: h must be >= 0, got $h")
    val gc = groupNames.map(col)
    val base = df.select(gc :+ t.as(s"${P}t")
      :+ x.cast("double").as(s"${P}x"): _*)
    val w = Window.partitionBy(gc: _*).orderBy(col(s"${P}t"))
    def ewmOf(c: String, out: String)(d: DataFrame): DataFrame = {
      val terms = (0 until span).map { k =>
        val wt = math.pow(1.0 - alpha, k)
        val lagged = if (k == 0) col(c) else lag(c, k).over(w)
        (lagged * wt, when(lagged.isNotNull, wt).otherwise(0.0))
      }
      d.withColumn(out,
        terms.map(p => coalesce(p._1, lit(0.0))).reduce(_ + _) /
          terms.map(_._2).reduce(_ + _))
    }
    val smoothed = ewmOf(s"${P}s1", s"${P}s2")(
      ewmOf(s"${P}x", s"${P}s1")(base))
    val level = col(s"${P}s1") * 2.0 - col(s"${P}s2")
    val trend = (col(s"${P}s1") - col(s"${P}s2")) *
      (alpha / (1.0 - alpha))
    smoothed
      .withColumn("level", level)
      .withColumn("trend", trend)
      .withColumn("forecast", level + trend * h)
      .drop(s"${P}s1", s"${P}s2")
      .withColumnRenamed(s"${P}t", "t")
      .withColumnRenamed(s"${P}x", "x")
  }
}
