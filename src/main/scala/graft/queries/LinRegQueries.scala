package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.agg.LinRegAgg
import graft.ops.LinRegOps

/** Driver-contract queries for SURVEY §2.9 — the linear-regression
  * family. Multi-feature OLS/ridge oracles solve the normal equations
  * explicitly in SQL (Cramer's rule over power sums), a genuinely
  * independent computation path from the Gram-aggregate + Gauss-Jordan
  * Scala side. */
object LinRegQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_simple_lin_reg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(LinRegOps.simpleSlope(col("l_quantity"),
            col("l_extendedprice")), 6).as("slope"),
          round(LinRegOps.simpleIntercept(col("l_quantity"),
            col("l_extendedprice")), 4).as("intercept"),
          round(LinRegOps.simpleSlopeW(col("l_quantity"),
            col("l_extendedprice"), col("l_discount") + 0.01), 6)
            .as("wslope"),
          round(LinRegOps.simpleInterceptW(col("l_quantity"),
            col("l_extendedprice"), col("l_discount") + 0.01), 4)
            .as("wintercept"))
        .orderBy("l_returnflag")
    }),
    "q_lin_reg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(LinRegAgg.linReg(
          array(col("l_quantity"), col("l_discount"), lit(1.0)),
          col("l_extendedprice"), 3).as("r"))
        .select(col("l_returnflag"),
          round(element_at(col("r.coeffs"), 1), 6).as("b_qty"),
          round(element_at(col("r.coeffs"), 2), 4).as("b_disc"),
          round(element_at(col("r.coeffs"), 3), 4).as("b0"),
          round(col("r.r2"), 6).as("r2"),
          round(col("r.adjR2"), 6).as("adj_r2"))
        .orderBy("l_returnflag")
    }),
    "q_ridge" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(LinRegAgg.linReg(
          array(col("l_quantity"), col("l_discount")),
          col("l_extendedprice"), 2, lambda = 1.0).as("r"))
        .select(col("l_returnflag"),
          round(element_at(col("r.coeffs"), 1), 6).as("b_qty"),
          round(element_at(col("r.coeffs"), 2), 4).as("b_disc"))
        .orderBy("l_returnflag")
    }),
    // f32 twin kernel (reference linear_regression_f32.rs via
    // config.py LIN_REG_EXPR_F64). f32 coefficients carry ~n·ε₃₂
    // accumulation noise amplified by the Gram's conditioning, so they
    // cannot be hash-compared against an f64 oracle directly; the
    // driver row is the established contract shape instead — exact
    // f64 values plus a boolean pinning the f32 kernel within a
    // relative band of them (same pattern as the ANN recall
    // contracts).
    "q_lin_reg_f32" -> ((s, dir) => {
      val b32 = element_at(col("r32.coeffs"), 1)
      val b64 = element_at(col("r64.coeffs"), 1)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          LinRegAgg.linReg(
            array(col("l_quantity"), col("l_discount"), lit(1.0)),
            col("l_extendedprice"), 3).as("r64"),
          graft.agg.LinRegAggF32.linRegF32(
            array(col("l_quantity"), col("l_discount"), lit(1.0)),
            col("l_extendedprice"), 3).as("r32"))
        .select(col("l_returnflag"),
          round(b64, 6).as("b_qty"),
          round(col("r64.r2"), 6).as("r2"),
          (abs(b32 - b64) < (abs(b64) + 1.0) * 0.05 &&
            abs(col("r32.r2") - col("r64.r2")) < lit(0.02))
            .as("f32_ok"))
        .orderBy("l_returnflag")
    }),
    // coeffs / std errors / t / r2 have closed SQL forms (σ²·(XᵀX)⁻¹
    // diagonal via the adjugate) → exact DuckDB oracle; only p-values
    // need the incomplete beta, so they stay in LinRegSpec's numpy
    // goldens instead of the driver row.
    "q_lin_reg_report" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(LinRegAgg.linReg(
          array(col("l_quantity"), col("l_discount"), lit(1.0)),
          col("l_extendedprice"), 3).as("r"))
        .select(col("l_returnflag"),
          round(element_at(col("r.coeffs"), 1), 6).as("beta_qty"),
          round(element_at(col("r.stdErr"), 1), 6).as("se_qty"),
          round(element_at(col("r.tVals"), 1), 4).as("t_qty"),
          round(col("r.r2"), 6).as("r2"),
          col("r.n").as("n"))
        .orderBy("l_returnflag")
    }),
    "q_rolling_lin_reg" -> ((s, dir) => {
      val df = LinRegOps.rollingSimpleLinReg(t(s, dir, "events"),
        col("value"), col("value") * 0.8 + col("event_id") % 13,
        col("event_id"), Seq("event_type"), 50)
      val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      df.withColumn("rn", row_number().over(w))
        .filter(col("rn") >= 2)
        .groupBy(col("event_type"))
        .agg(round(avg("rolling_slope"), 6).as("avg_slope"),
          round(avg("rolling_intercept"), 6).as("avg_intercept"))
        .orderBy("event_type")
    }),
    "q_recursive_lin_reg" -> ((s, dir) => {
      val df = LinRegOps.recursiveSimpleLinReg(t(s, dir, "events"),
        col("value"), col("value") * 0.8 + col("event_id") % 13,
        col("event_id"), Seq("event_type"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      df.withColumn("rn", row_number().over(w))
        .filter(col("rn") >= 2)
        .groupBy(col("event_type"))
        .agg(round(avg("recursive_slope"), 6).as("avg_slope"))
        .orderBy("event_type")
    }),
    // IRLS logistic on a target that is the EXACT inverse-logit of the
    // linear predictor: the score equation Σ x(y − μ(xβ)) = 0 is solved
    // by the constructing coefficients, so the MLE is known in closed
    // form and the oracle is a literal row (same device as q_glm). The
    // hard-label path (no closed form) stays numpy-golden in
    // LinRegSpec.
    "q_logistic_reg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("x1", (col("value") + col("event_id") % 21 - 10) / 100.0)
        .withColumn("yb",
          lit(1.0) / (lit(1.0) + exp(-(col("x1") * 3.0 - 1.0))))
      val beta = LinRegOps.logisticFit(ev, Seq(col("x1")), col("yb"))
      import s.implicits._
      Seq((beta(0), beta(1))).toDF("b_x1", "b0")
        .select(round(col("b_x1"), 6).as("b_x1"),
          round(col("b0"), 6).as("b0"))
    }),
    // Per-group logistic (logisticFitGrouped): the oracle is the MLE
    // score equation itself — at the optimum Σ(μ−y) = 0 per group and
    // Σ xⱼ(μ−y) = 0 per feature, so the residual sums are literal 0.0
    // in SQL while n / sum_y are real value checks. `+ 0.0` normalizes
    // IEEE −0.0 from rounding a tiny negative residual.
    "q_logistic_grp" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("x1", col("l_quantity") / 10.0)
        .withColumn("x2", col("l_discount") * 10.0)
        .withColumn("yb", (col("l_extendedprice") > 30000).cast("double"))
      val fit = LinRegOps.logisticFitGrouped(li, Seq("l_returnflag"),
        Seq(col("x1"), col("x2")), col("yb"), maxIter = 60, tol = 1e-12)
      LinRegOps.glmPredictGrouped(li, fit, Seq("l_returnflag"),
          Seq(col("x1"), col("x2")), out = "mu")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("yb")), 1).as("sum_y"),
          (round(sum(col("mu") - col("yb")), 3) + 0.0).as("score_bias"),
          (round(sum(col("x1") * (col("mu") - col("yb"))), 3) + 0.0)
            .as("score_x1"),
          (round(sum(col("x2") * (col("mu") - col("yb"))), 3) + 0.0)
            .as("score_x2"))
        .orderBy("l_returnflag")
    }),
    // Per-group GLM (glmFitGrouped): same score-equation device as
    // q_logistic_grp. Both families fit their CANONICAL link
    // (glm_solvers.rs:29-36 — log for poisson, inverse for gamma), so
    // the MLE satisfies Σ xⱼ(y−μ) = 0 for each — literal 0.0.
    "q_glm_grp" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("x1", col("l_quantity") / 10.0)
        .withColumn("x2", col("l_discount") * 10.0)
        .withColumn("yp",
          exp(col("x1") * 0.2 - col("x2") * 0.08 + 0.3))
      // the two family fits are independent IRLS loops of small
      // sequential jobs — overlap them (same device as q_glm)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fp = Future(LinRegOps.glmFitGrouped(li, Seq("l_returnflag"),
        Seq(col("x1"), col("x2")), col("yp"), "poisson",
        maxIter = 60, tol = 1e-12))
      val fg = Future(LinRegOps.glmFitGrouped(li, Seq("l_returnflag"),
        Seq(col("x1"), col("x2")), col("yp"), "gamma",
        maxIter = 60, tol = 1e-12))
      val fitP = Await.result(fp, Duration.Inf)
      val fitG = Await.result(fg, Duration.Inf)
      val withP = LinRegOps.glmPredictGrouped(li, fitP,
        Seq("l_returnflag"), Seq(col("x1"), col("x2")), "poisson", "mp")
      LinRegOps.glmPredictGrouped(withP, fitG,
          Seq("l_returnflag"), Seq(col("x1"), col("x2")), "gamma", "mg")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          (round(sum(col("yp") - col("mp")), 3) + 0.0).as("score_p0"),
          (round(sum(col("x1") * (col("yp") - col("mp"))), 3) + 0.0)
            .as("score_p1"),
          (round(sum(col("x2") * (col("yp") - col("mp"))), 3) + 0.0)
            .as("score_p2"),
          (round(sum(col("yp") - col("mg")), 3) + 0.0)
            .as("score_g0"),
          (round(sum(col("x1") * (col("yp") - col("mg"))), 3)
            + 0.0).as("score_g1"),
          (round(sum(col("x2") * (col("yp") - col("mg"))), 3)
            + 0.0).as("score_g2"))
        .orderBy("l_returnflag")
    }),
    // l1-regularized logistic (expr_linear.py:281): no closed form, so
    // the oracle pins the KKT conditions of the lasso optimum — the
    // unpenalized bias keeps a zero score residual, and the penalized
    // coordinate satisfies |Σx(μ−y)| ≤ m·l1 (zero coef) or
    // Σx(μ−y) = −m·l1·sign(β) — as a deterministic boolean.
    "q_logistic_l1" -> ((s, dir) => {
      val lam = 0.02
      val ev = t(s, dir, "events")
        .withColumn("x1", (col("value") + col("event_id") % 21 - 10) / 100.0)
        .withColumn("yb",
          lit(1.0) / (lit(1.0) + exp(-(col("x1") * 3.0 - 1.0))))
      val beta = LinRegOps.logisticFit(ev, Seq(col("x1")), col("yb"),
        maxIter = 60, tol = 1e-13, l1 = lam)
      val scored = ev.agg(
        count(lit(1)).cast("double").as("m"),
        sum(LinRegOps.logisticPredict(Seq(col("x1")), beta) - col("yb"))
          .as("sb"),
        sum(col("x1") *
          (LinRegOps.logisticPredict(Seq(col("x1")), beta) - col("yb")))
          .as("sx")).collect()(0)
      val (m, sb, sx) =
        (scored.getDouble(0), scored.getDouble(1), scored.getDouble(2))
      val kktOk =
        if (beta(0) == 0.0) math.abs(sx) <= m * lam + 1e-6 * m
        else math.abs(sx + m * lam * math.signum(beta(0))) <= 1e-6 * m
      import s.implicits._
      Seq((math.round(m), sb, kktOk, beta(0) != 0.0))
        .toDF("n", "score_bias", "kkt_ok", "coef_nonzero")
        .select(col("n"),
          (round(col("score_bias"), 3) + 0.0).as("score_bias"),
          col("kkt_ok"), col("coef_nonzero"))
    })
  )

  private val sums =
    """SELECT l_returnflag,
      |  COUNT(*)::DOUBLE n,
      |  SUM(l_quantity) s1, SUM(l_discount) s2,
      |  SUM(l_quantity * l_quantity) s11,
      |  SUM(l_quantity * l_discount) s12,
      |  SUM(l_discount * l_discount) s22,
      |  SUM(l_extendedprice) sy,
      |  SUM(l_quantity * l_extendedprice) s1y,
      |  SUM(l_discount * l_extendedprice) s2y,
      |  SUM(l_extendedprice * l_extendedprice) syy
      |FROM lineitem GROUP BY 1""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_simple_lin_reg" ->
      """SELECT l_returnflag,
        |  ROUND(REGR_SLOPE(y, x), 6) AS slope,
        |  ROUND(REGR_INTERCEPT(y, x), 4) AS intercept,
        |  ROUND((SUM(w*x*y) - SUM(w*x)*SUM(w*y)/SUM(w))
        |    / (SUM(w*x*x) - SUM(w*x)*SUM(w*x)/SUM(w)), 6) AS wslope,
        |  ROUND(SUM(w*y)/SUM(w)
        |    - (SUM(w*x*y) - SUM(w*x)*SUM(w*y)/SUM(w))
        |      / (SUM(w*x*x) - SUM(w*x)*SUM(w*x)/SUM(w))
        |      * SUM(w*x)/SUM(w), 4) AS wintercept
        |FROM (SELECT l_returnflag, l_quantity x, l_extendedprice y,
        |        l_discount + 0.01 w
        |      FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_lin_reg" ->
      s"""WITH s AS ($sums),
         |d AS (
         |  SELECT *,
         |    s11*(s22*n - s2*s2) - s12*(s12*n - s2*s1)
         |      + s1*(s12*s2 - s22*s1) AS det
         |  FROM s),
         |b AS (
         |  SELECT l_returnflag, n, sy, syy,
         |    (s1y*(s22*n - s2*s2) - s12*(s2y*n - s2*sy)
         |      + s1*(s2y*s2 - s22*sy)) / det AS b1,
         |    (s11*(s2y*n - sy*s2) - s1y*(s12*n - s2*s1)
         |      + s1*(s12*sy - s2y*s1)) / det AS b2,
         |    (s11*(s22*sy - s2y*s2) - s12*(s12*sy - s2y*s1)
         |      + s1y*(s12*s2 - s22*s1)) / det AS b0,
         |    s1y, s2y
         |  FROM d)
         |SELECT l_returnflag,
         |  ROUND(b1, 6) AS b_qty, ROUND(b2, 4) AS b_disc,
         |  ROUND(b0, 4) AS b0,
         |  ROUND(1 - (syy - b1*s1y - b2*s2y - b0*sy)
         |    / (syy - sy*sy/n), 6) AS r2,
         |  ROUND(1 - (1 - (1 - (syy - b1*s1y - b2*s2y - b0*sy)
         |    / (syy - sy*sy/n))) * (n-1) / (n-3), 6) AS adj_r2
         |FROM b ORDER BY 1""".stripMargin,
    "q_ridge" ->
      s"""WITH s AS ($sums)
         |SELECT l_returnflag,
         |  ROUND((s1y*(s22+1) - s12*s2y)
         |    / ((s11+1)*(s22+1) - s12*s12), 6) AS b_qty,
         |  ROUND(((s11+1)*s2y - s12*s1y)
         |    / ((s11+1)*(s22+1) - s12*s12), 4) AS b_disc
         |FROM s ORDER BY 1""".stripMargin,
    "q_lin_reg_f32" ->
      s"""WITH s AS ($sums),
         |d AS (
         |  SELECT *,
         |    s11*(s22*n - s2*s2) - s12*(s12*n - s2*s1)
         |      + s1*(s12*s2 - s22*s1) AS det
         |  FROM s),
         |b AS (
         |  SELECT l_returnflag, n, sy, syy,
         |    (s1y*(s22*n - s2*s2) - s12*(s2y*n - s2*sy)
         |      + s1*(s2y*s2 - s22*sy)) / det AS b1,
         |    (s11*(s2y*n - sy*s2) - s1y*(s12*n - s2*s1)
         |      + s1*(s12*sy - s2y*s1)) / det AS b2,
         |    (s11*(s22*sy - s2y*s2) - s12*(s12*sy - s2y*s1)
         |      + s1y*(s12*s2 - s22*s1)) / det AS b0,
         |    s1y, s2y
         |  FROM d)
         |SELECT l_returnflag,
         |  ROUND(b1, 6) AS b_qty,
         |  ROUND(1 - (syy - b1*s1y - b2*s2y - b0*sy)
         |    / (syy - sy*sy/n), 6) AS r2,
         |  TRUE AS f32_ok
         |FROM b ORDER BY 1""".stripMargin,
    "q_rolling_lin_reg" ->
      """WITH t AS (
        |  SELECT event_type, event_id, value x,
        |    value * 0.8 + event_id % 13 AS y
        |  FROM events),
        |w AS (
        |  SELECT event_type,
        |    ROW_NUMBER() OVER win rn,
        |    COUNT(*) OVER win49::DOUBLE n,
        |    SUM(x) OVER win49 sx, SUM(y) OVER win49 sy,
        |    SUM(x*y) OVER win49 sxy, SUM(x*x) OVER win49 sxx
        |  FROM t
        |  WINDOW win AS (PARTITION BY event_type ORDER BY event_id),
        |    win49 AS (PARTITION BY event_type ORDER BY event_id
        |      ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)),
        |sl AS (
        |  SELECT event_type,
        |    (sxy - sx*sy/n) / (sxx - sx*sx/n) AS slope,
        |    (sy - (sxy - sx*sy/n) / (sxx - sx*sx/n) * sx) / n AS icept
        |  FROM w WHERE rn >= 2)
        |SELECT event_type, ROUND(AVG(slope), 6) AS avg_slope,
        |  ROUND(AVG(icept), 6) AS avg_intercept
        |FROM sl GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_recursive_lin_reg" ->
      """WITH t AS (
        |  SELECT event_type, event_id, value x,
        |    value * 0.8 + event_id % 13 AS y
        |  FROM events),
        |w AS (
        |  SELECT event_type,
        |    ROW_NUMBER() OVER win rn,
        |    COUNT(*) OVER winu::DOUBLE n,
        |    SUM(x) OVER winu sx, SUM(y) OVER winu sy,
        |    SUM(x*y) OVER winu sxy, SUM(x*x) OVER winu sxx
        |  FROM t
        |  WINDOW win AS (PARTITION BY event_type ORDER BY event_id),
        |    winu AS (PARTITION BY event_type ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type,
        |  ROUND(AVG((sxy - sx*sy/n) / (sxx - sx*sx/n)), 6) AS avg_slope
        |FROM w WHERE rn >= 2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_lin_reg_report" ->
      s"""WITH s AS ($sums),
         |d AS (
         |  SELECT *,
         |    s11*(s22*n - s2*s2) - s12*(s12*n - s2*s1)
         |      + s1*(s12*s2 - s22*s1) AS det
         |  FROM s),
         |b AS (
         |  SELECT *,
         |    (s1y*(s22*n - s2*s2) - s12*(s2y*n - s2*sy)
         |      + s1*(s2y*s2 - s22*sy)) / det AS b1,
         |    (s11*(s2y*n - sy*s2) - s1y*(s12*n - s2*s1)
         |      + s1*(s12*sy - s2y*s1)) / det AS b2,
         |    (s11*(s22*sy - s2y*s2) - s12*(s12*sy - s2y*s1)
         |      + s1y*(s12*s2 - s22*s1)) / det AS b0
         |  FROM d),
         |r AS (
         |  SELECT l_returnflag, n, b1,
         |    syy - (b1*s1y + b2*s2y + b0*sy) AS sse,
         |    syy - sy*sy/n AS sst,
         |    (s22*n - s2*s2) / det AS inv11
         |  FROM b)
         |SELECT l_returnflag,
         |  ROUND(b1, 6) AS beta_qty,
         |  ROUND(SQRT(sse / (n - 3) * inv11), 6) AS se_qty,
         |  ROUND(b1 / SQRT(sse / (n - 3) * inv11), 4) AS t_qty,
         |  ROUND(1 - sse / sst, 6) AS r2,
         |  n::BIGINT AS n
         |FROM r ORDER BY 1""".stripMargin,
    "q_logistic_reg" -> "SELECT 3.0 AS b_x1, -1.0 AS b0",
    "q_logistic_grp" ->
      """SELECT l_returnflag, COUNT(*)::BIGINT AS n,
        |  ROUND(SUM(CASE WHEN l_extendedprice > 30000 THEN 1.0
        |    ELSE 0.0 END), 1) AS sum_y,
        |  0.0 AS score_bias, 0.0 AS score_x1, 0.0 AS score_x2
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_logistic_l1" ->
      """SELECT COUNT(*)::BIGINT AS n, 0.0 AS score_bias,
        |  true AS kkt_ok, true AS coef_nonzero FROM events""".stripMargin,
    "q_glm_grp" ->
      """SELECT l_returnflag, COUNT(*)::BIGINT AS n,
        |  0.0 AS score_p0, 0.0 AS score_p1, 0.0 AS score_p2,
        |  0.0 AS score_g0, 0.0 AS score_g1, 0.0 AS score_g2
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
