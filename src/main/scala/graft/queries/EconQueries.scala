package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.EconOps

/** Driver-contract queries for the econometrics family (EconOps).
  * PACF's oracle unrolls the Durbin-Levinson recursion to lag 3 in
  * SQL; the Dickey-Fuller oracle uses the t = r*sqrt((n-2)/(1-r^2))
  * slope-t identity; Granger's unrolls the two-regressor R^2 identity.
  * p-values (F / normal CDFs) are asserted in EconSpec and excluded
  * from the oracle projection, matching q_chi2's convention. */
object EconQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pacf" -> ((s, dir) => {
      EconOps.pacf(t(s, dir, "events"), col("value"), col("event_id"),
          Seq("event_type"), 3)
        .select(col("event_type"),
          round(col("pacf")(0), 6).as("pacf1"),
          round(col("pacf")(1), 6).as("pacf2"),
          round(col("pacf")(2), 6).as("pacf3"))
        .orderBy("event_type")
    }),
    "q_adf" -> ((s, dir) => {
      EconOps.dickeyFuller(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"), 0)
        .select(col("event_type"), col("n"),
          round(col("statistic"), 6).as("statistic"))
        .orderBy("event_type")
    }),
    "q_granger" -> ((s, dir) => {
      EconOps.grangerCausality(t(s, dir, "events"), col("value"),
          length(col("props")).cast("double"), col("event_id"),
          Seq("event_type"), 1)
        .select(col("event_type"), col("n"),
          round(col("statistic"), 4).as("statistic"),
          col("df1"), col("df2"))
        .orderBy("event_type")
    }),
    "q_ccf" -> ((s, dir) => {
      EconOps.ccf(t(s, dir, "events"), col("value"),
          length(col("props")).cast("double"), col("event_id"),
          Seq("event_type"), 2)
        .select(col("event_type"),
          round(col("ccf_m2"), 6).as("ccf_m2"),
          round(col("ccf_m1"), 6).as("ccf_m1"),
          round(col("ccf_0"), 6).as("ccf_0"),
          round(col("ccf_p1"), 6).as("ccf_p1"),
          round(col("ccf_p2"), 6).as("ccf_p2"))
        .orderBy("event_type")
    }),
    "q_kpss" -> ((s, dir) => {
      EconOps.kpss(t(s, dir, "events"), col("value"), col("event_id"),
          Seq("event_type"), 4)
        .select(col("event_type"), col("n"),
          round(col("statistic"), 6).as("statistic"))
        .orderBy("event_type")
    }),
    "q_engle_granger" -> ((s, dir) => {
      EconOps.engleGranger(t(s, dir, "events"), col("value"),
          length(col("props")).cast("double"), col("event_id"),
          Seq("event_type"))
        .select(col("event_type"), col("n"),
          round(col("beta"), 6).as("beta"),
          round(col("intercept"), 6).as("intercept"),
          round(col("statistic"), 6).as("statistic"))
        .orderBy("event_type")
    }),
    "q_arch_lm" -> ((s, dir) => {
      EconOps.archLm(t(s, dir, "events"), col("value"), col("event_id"),
          Seq("event_type"), 2)
        .select(col("event_type"), col("n"),
          round(col("statistic"), 4).as("statistic"), col("df"))
        .orderBy("event_type")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_pacf" ->
      """WITH m AS (
        |  SELECT event_type, AVG(value) mu FROM events GROUP BY 1),
        |l AS (
        |  SELECT event_type, value,
        |    LAG(value,1) OVER (PARTITION BY event_type ORDER BY event_id) l1,
        |    LAG(value,2) OVER (PARTITION BY event_type ORDER BY event_id) l2,
        |    LAG(value,3) OVER (PARTITION BY event_type ORDER BY event_id) l3
        |  FROM events),
        |s AS (
        |  SELECT l.event_type,
        |    SUM((value-mu)*(value-mu)) s0,
        |    SUM((value-mu)*(l1-mu)) s1, SUM((value-mu)*(l2-mu)) s2,
        |    SUM((value-mu)*(l3-mu)) s3
        |  FROM l JOIN m USING (event_type) GROUP BY 1),
        |r AS (SELECT event_type, s1/s0 r1, s2/s0 r2, s3/s0 r3 FROM s),
        |p2 AS (SELECT *, (r2 - r1*r1)/(1 - r1*r1) f22 FROM r),
        |p3 AS (SELECT *, r1 - f22*r1 f21,
        |  (1 - r1*r1)*(1 - f22*f22) v2 FROM p2)
        |SELECT event_type, ROUND(r1, 6) AS pacf1, ROUND(f22, 6) AS pacf2,
        |  ROUND((r3 - f21*r2 - f22*r1)/v2, 6) AS pacf3
        |FROM p3 ORDER BY 1""".stripMargin,
    "q_adf" ->
      """WITH l AS (
        |  SELECT event_type,
        |    value - LAG(value,1) OVER (PARTITION BY event_type
        |      ORDER BY event_id) dx,
        |    LAG(value,1) OVER (PARTITION BY event_type
        |      ORDER BY event_id) xm1
        |  FROM events),
        |c AS (
        |  SELECT event_type, CORR(dx, xm1) r, COUNT(*)::DOUBLE n
        |  FROM l WHERE xm1 IS NOT NULL GROUP BY 1)
        |SELECT event_type, n::BIGINT AS n,
        |  ROUND(r*SQRT((n-2)/(1-r*r)), 6) AS statistic
        |FROM c ORDER BY 1""".stripMargin,
    "q_granger" ->
      """WITH l AS (
        |  SELECT event_type, value y,
        |    LAG(value,1) OVER (PARTITION BY event_type
        |      ORDER BY event_id) yl,
        |    LAG(LENGTH(props)::DOUBLE,1) OVER (PARTITION BY event_type
        |      ORDER BY event_id) xl
        |  FROM events),
        |c AS (
        |  SELECT event_type, COUNT(*)::DOUBLE n,
        |    CORR(y, yl) ry1, CORR(y, xl) ry2, CORR(yl, xl) r12
        |  FROM l WHERE yl IS NOT NULL AND xl IS NOT NULL GROUP BY 1),
        |s AS (
        |  SELECT event_type, n, ry1*ry1 r2r,
        |    (ry1*ry1 + ry2*ry2 - 2*ry1*ry2*r12)/(1 - r12*r12) r2u
        |  FROM c)
        |SELECT event_type, n::BIGINT AS n,
        |  ROUND((r2u - r2r)/((1 - r2u)/(n - 3)), 4) AS statistic,
        |  1.0 AS df1, n - 3 AS df2
        |FROM s ORDER BY 1""".stripMargin,
    "q_ccf" ->
      """WITH l AS (
        |  SELECT event_type, value x, LENGTH(props)::DOUBLE y,
        |    event_id
        |  FROM events),
        |sh AS (
        |  SELECT event_type, x,
        |    LEAD(y,2) OVER (PARTITION BY event_type ORDER BY event_id) yf2,
        |    LEAD(y,1) OVER (PARTITION BY event_type ORDER BY event_id) yf1,
        |    y y0,
        |    LAG(y,1) OVER (PARTITION BY event_type ORDER BY event_id) yl1,
        |    LAG(y,2) OVER (PARTITION BY event_type ORDER BY event_id) yl2
        |  FROM l)
        |SELECT event_type,
        |  ROUND(CORR(x, yf2), 6) AS ccf_m2,
        |  ROUND(CORR(x, yf1), 6) AS ccf_m1,
        |  ROUND(CORR(x, y0), 6) AS ccf_0,
        |  ROUND(CORR(x, yl1), 6) AS ccf_p1,
        |  ROUND(CORR(x, yl2), 6) AS ccf_p2
        |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_kpss" ->
      """WITH m AS (
        |  SELECT event_type, AVG(value) mu, COUNT(*)::DOUBLE n
        |  FROM events GROUP BY 1),
        |e AS (
        |  SELECT ev.event_type, event_id, value - mu ee, n
        |  FROM events ev JOIN m USING (event_type)),
        |s AS (
        |  SELECT event_type, ee, n,
        |    SUM(ee) OVER (PARTITION BY event_type ORDER BY event_id) ss,
        |    LAG(ee,1) OVER (PARTITION BY event_type ORDER BY event_id) e1,
        |    LAG(ee,2) OVER (PARTITION BY event_type ORDER BY event_id) e2,
        |    LAG(ee,3) OVER (PARTITION BY event_type ORDER BY event_id) e3,
        |    LAG(ee,4) OVER (PARTITION BY event_type ORDER BY event_id) e4
        |  FROM e),
        |a AS (
        |  SELECT event_type, ANY_VALUE(n) n, SUM(ss*ss) sss,
        |    SUM(ee*ee) g0, SUM(ee*e1) g1, SUM(ee*e2) g2,
        |    SUM(ee*e3) g3, SUM(ee*e4) g4
        |  FROM s GROUP BY 1)
        |SELECT event_type, n::BIGINT AS n,
        |  ROUND((sss/(n*n))
        |    / ((g0 + 2*(0.8*g1 + 0.6*g2 + 0.4*g3 + 0.2*g4))/n), 6)
        |    AS statistic
        |FROM a ORDER BY 1""".stripMargin,
    "q_engle_granger" ->
      """WITH f AS (
        |  SELECT event_type,
        |    COVAR_POP(value, LENGTH(props)::DOUBLE)
        |      / VAR_POP(LENGTH(props)::DOUBLE) b,
        |    AVG(value) my, AVG(LENGTH(props)::DOUBLE) mx
        |  FROM events GROUP BY 1),
        |u AS (
        |  SELECT ev.event_type, event_id,
        |    value - my - b*(LENGTH(props)::DOUBLE - mx) u, b, my, mx
        |  FROM events ev JOIN f USING (event_type)),
        |l AS (
        |  SELECT event_type, u,
        |    LAG(u,1) OVER (PARTITION BY event_type ORDER BY event_id)
        |      um1, b, my, mx
        |  FROM u),
        |a AS (
        |  SELECT event_type, SUM((u-um1)*um1) sxy, SUM(um1*um1) sxx,
        |    SUM((u-um1)*(u-um1)) syy, COUNT(*)::DOUBLE n,
        |    ANY_VALUE(b) b, ANY_VALUE(my) my, ANY_VALUE(mx) mx
        |  FROM l WHERE um1 IS NOT NULL GROUP BY 1)
        |SELECT event_type, n::BIGINT AS n, ROUND(b, 6) AS beta,
        |  ROUND(my - b*mx, 6) AS intercept,
        |  ROUND((sxy/sxx)
        |    / SQRT(((syy - (sxy/sxx)*(sxy/sxx)*sxx)/(n-1))/sxx), 6)
        |    AS statistic
        |FROM a ORDER BY 1""".stripMargin,
    "q_arch_lm" ->
      """WITH m AS (
        |  SELECT event_type, AVG(value) mu FROM events GROUP BY 1),
        |e AS (
        |  SELECT ev.event_type, event_id, POWER(value - mu, 2) e2
        |  FROM events ev JOIN m USING (event_type)),
        |l AS (
        |  SELECT event_type, e2,
        |    LAG(e2,1) OVER (PARTITION BY event_type ORDER BY event_id) l1,
        |    LAG(e2,2) OVER (PARTITION BY event_type ORDER BY event_id) l2
        |  FROM e),
        |c AS (
        |  SELECT event_type, COUNT(*)::DOUBLE n, CORR(e2, l1) r1,
        |    CORR(e2, l2) r2, CORR(l1, l2) r12
        |  FROM l WHERE l1 IS NOT NULL AND l2 IS NOT NULL GROUP BY 1)
        |SELECT event_type, n::BIGINT AS n,
        |  ROUND(n * (r1*r1 + r2*r2 - 2*r1*r2*r12)/(1 - r12*r12), 4)
        |    AS statistic,
        |  2.0 AS df
        |FROM c ORDER BY 1""".stripMargin
  )
}
