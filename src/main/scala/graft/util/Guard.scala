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

  /** Default cap for fit-time distinct-value collects (pipeline
    * encoders). Override with JVM property `graft.maxFitCardinality`.
    * Well past this, a when-chain encoder is the wrong tool anyway
    * (the generated CASE has one branch per level). */
  def fitCardinalityCap: Int =
    sys.props.get("graft.maxFitCardinality").map(_.toInt).getOrElse(10000)

  /** Collect the distinct values of a column for fit-time encoding,
    * failing fast past `cap` — a high-cardinality key would otherwise
    * OOM the driver (and emit a million-branch CASE) long after the
    * scan ran. */
  def cappedDistinct(df: org.apache.spark.sql.DataFrame, c: String,
                     op: String, cap: Int = fitCardinalityCap)
      : Array[Any] = {
    val vals = df.select(col(c)).na.drop().distinct()
      .orderBy(col(c)).limit(cap + 1).collect().map(_.get(0))
    require(vals.length <= cap,
      s"graft.$op: column '$c' has more than $cap distinct values — " +
        "fit-time encoders collect the level set to the driver and " +
        "emit one CASE branch per level. Reduce cardinality (bucket / " +
        "hash the column) or raise -Dgraft.maxFitCardinality.")
    vals
  }
}
