package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Guard rails for the collect-per-group kernels (SURVEY §7 hard
  * parts): whole-series operators (spline, DFT, SampEn/ApEn, KNN
  * entropies) buffer one group's series in one task BY DESIGN — exact
  * sequential kernels have no distributed form. At 100 TB that
  * contract must fail fast with an actionable message, not OOM an
  * executor 40 minutes into a stage. */
object Guard {

  /** Default per-group series cap (elements). Override with JVM
    * property `graft.maxSeriesLen`. 10M doubles ≈ 80 MB buffered —
    * safely inside a task's share of executor memory at default
    * configs, far beyond any sane series for these kernels. */
  def defaultCap: Int =
    sys.props.get("graft.maxSeriesLen").map(_.toInt).getOrElse(10000000)

  /** Wrap a collected-series column so exceeding `cap` raises a
    * diagnosable error (codegen'd size check; zero cost on the happy
    * path). */
  def cappedSeries(c: Column, op: String,
                   cap: Int = defaultCap): Column =
    when(size(c) > cap, raise_error(concat(
      lit(s"graft.$op: per-group series of "), size(c).cast("string"),
      lit(s" elements exceeds cap $cap — this kernel buffers the " +
        "whole group in one task; split the group, pre-aggregate, " +
        "or raise -Dgraft.maxSeriesLen"))))
      .otherwise(c)
}
