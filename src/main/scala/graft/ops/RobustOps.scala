package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust simple regression (y ~ x per group) by iteratively
  * reweighted least squares with M-estimator weights — the
  * outlier-resistant complement to [[LinRegOps.simpleLinReg]] for
  * fitting trends over corpus metrics where a few wild rows (a broken
  * crawler day, a mis-parsed document) would drag OLS.
  *
  * The iteration count is a FIXED, caller-visible contract (not a
  * convergence loop): every iteration is two algebraic passes — a
  * weighted-moment aggregate and an exact per-group residual-scale
  * median — so a `maxIter`-step fit is exactly replayable by any SQL
  * engine (the oracle replays it CTE by CTE), and the plan cost is
  * known up front: 2·maxIter+3 map-side-combinable aggregates over the
  * narrow (group, x, y) projection, no driver-side data loops.
  *
  * Weights at scaled residual u = e / (c * s), with
  * s = median(|e|) / 0.6745 (the normal-consistent median absolute
  * residual; the intercept term keeps the residual median near zero):
  *   huber:    w = min(1, 1/|u|)
  *   bisquare: w = (1 - u^2)^2 for |u| < 1 else 0   (Tukey)
  * A zero scale (perfect fit) short-circuits to w = 1.
  */
object RobustOps {

  private val P = "__rob_"

  private def joinBack(rows: DataFrame, stats: DataFrame,
                       groupNames: Seq[String]): DataFrame =
    if (groupNames.isEmpty) rows.crossJoin(broadcast(stats))
    else rows.join(stats, groupNames)

  /** Weighted simple-regression moments -> {slope, intercept} frame. */
  private def wFit(rows: DataFrame, gc: Seq[Column], w: Column,
                   groupNames: Seq[String]): DataFrame = {
    val sw = sum(w)
    val swx = sum(w * col(s"${P}x")); val swy = sum(w * col(s"${P}y"))
    val swxx = sum(w * col(s"${P}x") * col(s"${P}x"))
    val swxy = sum(w * col(s"${P}x") * col(s"${P}y"))
    rows.groupBy(gc: _*)
      .agg(((swxy - swx * swy / sw) / (swxx - swx * swx / sw))
        .as(s"${P}b"),
        (swy / sw).as(s"${P}wmy"), (swx / sw).as(s"${P}wmx"))
      .withColumn(s"${P}a",
        col(s"${P}wmy") - col(s"${P}b") * col(s"${P}wmx"))
      .drop(s"${P}wmy", s"${P}wmx")
  }

  /** IRLS M-estimator fit of y ~ x per group. `method` is "huber" or
    * "bisquare"; `c` the tuning constant in scale units (1.345 / 4.685
    * give 95% normal efficiency); `maxIter` the exact number of
    * reweight steps after the OLS start. Returns {groups..., n, slope,
    * intercept, scale} with scale the median-|residual|/0.6745 of the
    * FINAL fit. */
  def mReg(df: DataFrame, y: Column, x: Column,
           groupNames: Seq[String], method: String,
           c: Double, maxIter: Int): DataFrame = {
    require(method == "huber" || method == "bisquare",
      s"mReg: method must be huber|bisquare, got $method")
    require(c > 0.0 && maxIter >= 1 && maxIter <= 16,
      s"mReg: need c > 0 and 1 <= maxIter <= 16, got c=$c iter=$maxIter")
    val gc = groupNames.map(col)
    val base = df.select(gc :+ y.cast("double").as(s"${P}y")
      :+ x.cast("double").as(s"${P}x"): _*)
    def weight(u: Column): Column = method match {
      case "huber" => least(lit(1.0), lit(1.0) / abs(u))
      case _ => when(abs(u) < 1.0,
        pow(lit(1.0) - u * u, 2.0)).otherwise(0.0)
    }
    // residual scale of the fit `ab` over `base`
    def scaleOf(ab: DataFrame): DataFrame = {
      val e = col(s"${P}y") - col(s"${P}a") - col(s"${P}b") * col(s"${P}x")
      joinBack(base, ab, groupNames)
        .withColumn(s"${P}ae", abs(e))
        .groupBy(gc: _*)
        .agg((median(col(s"${P}ae")) / 0.6745).as(s"${P}s"))
    }
    var fit = wFit(base, gc, lit(1.0), groupNames) // OLS start
    for (_ <- 1 to maxIter) {
      val withFit = joinBack(
        joinBack(base, fit, groupNames), scaleOf(fit), groupNames)
      val e = col(s"${P}y") - col(s"${P}a") - col(s"${P}b") * col(s"${P}x")
      val u = e / (col(s"${P}s") * c)
      val w = when(col(s"${P}s") <= 0.0, lit(1.0)).otherwise(weight(u))
      fit = wFit(withFit, gc, w, groupNames)
    }
    val n = base.groupBy(gc: _*).agg(count(lit(1)).as("n"))
    val out = joinBack(n, fit, groupNames)
    joinBack(out, scaleOf(fit), groupNames)
      .select(gc ++ Seq(col("n"), col(s"${P}b").as("slope"),
        col(s"${P}a").as("intercept"),
        col(s"${P}s").as("scale")): _*)
  }

  /** Huber M-regression with the 95%-efficiency constant. */
  def huberReg(df: DataFrame, y: Column, x: Column,
               groupNames: Seq[String], maxIter: Int = 3,
               c: Double = 1.345): DataFrame =
    mReg(df, y, x, groupNames, "huber", c, maxIter)

  /** Tukey bisquare M-regression with the 95%-efficiency constant. */
  def bisquareReg(df: DataFrame, y: Column, x: Column,
                  groupNames: Seq[String], maxIter: Int = 3,
                  c: Double = 4.685): DataFrame =
    mReg(df, y, x, groupNames, "bisquare", c, maxIter)
}
