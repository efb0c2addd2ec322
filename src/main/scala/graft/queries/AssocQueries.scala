package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AssocOps, RobustOps}

/** Driver-contract queries for the association-structure family
  * (AssocOps) plus quantile regression (RobustOps.quantileReg). F/t
  * p-values are spec-gated per the family convention; every statistic
  * and the full quantile-IRLS iteration chain replay in SQL. */
object AssocQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chow" -> ((s, dir) => {
      AssocOps.chowTest(t(s, dir, "lineitem"), col("l_extendedprice"),
          col("l_quantity"), col("l_discount") > 0.05,
          Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n1"), col("n2"),
          round(col("f_stat"), 4).as("f_stat"),
          col("df1"), col("df2"))
        .orderBy("l_returnflag")
    }),
    "q_partial_corr" -> ((s, dir) => {
      AssocOps.partialCorr(t(s, dir, "lineitem"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"),
          Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"),
          round(col("r_xy"), 6).as("r_xy"),
          round(col("r_xy_z"), 6).as("r_xy_z"),
          round(col("t"), 4).as("t"))
        .orderBy("l_returnflag")
    }),
    "q_mi_binned" -> ((s, dir) => {
      AssocOps.miBinned(t(s, dir, "events"), col("value"),
          col("user_id"), Seq("event_type"), 12)
        .select(col("event_type"), col("bins"),
          round(col("mi"), 6).as("mi"),
          round(col("nmi"), 6).as("nmi"))
        .orderBy("event_type")
    }),
    "q_quantile_reg" -> ((s, dir) => {
      RobustOps.quantileReg(
          t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 1),
          col("l_extendedprice"), col("l_quantity"), tau = 0.75,
          Seq("l_returnflag"), maxIter = 3, delta = 0.01)
        .select(col("l_returnflag"), col("n"),
          round(col("slope"), 4).as("slope"),
          round(col("intercept"), 2).as("intercept"),
          round(col("below_frac"), 6).as("below_frac"))
        .orderBy("l_returnflag")
    })
  )

  // quantile-IRLS oracle: OLS start, then maxIter reweighted fits
  private val quantileSql: String = {
    val wfit =
      """    (SUM(w*x*y) - SUM(w*x)*SUM(w*y)/SUM(w))
        |      / (SUM(w*x*x) - SUM(w*x)*SUM(w*x)/SUM(w)) b,
        |    SUM(w*y)/SUM(w)
        |      - (SUM(w*x*y) - SUM(w*x)*SUM(w*y)/SUM(w))
        |        / (SUM(w*x*x) - SUM(w*x)*SUM(w*x)/SUM(w))
        |        * SUM(w*x)/SUM(w) a""".stripMargin
    def iter(i: Int): String =
      s"""r$i AS (
         |  SELECT t.g, x, y,
         |    (0.25 + 0.5*LEAST(GREATEST((y - a - b*x + 0.01)/0.02, 0), 1))
         |      / GREATEST(ABS(y - a - b*x), 0.01) w
         |  FROM t JOIN f$i ON t.g = f$i.g),
         |f${i + 1} AS (
         |  SELECT g,
         |$wfit
         |  FROM r$i GROUP BY 1),""".stripMargin
    s"""WITH t0 AS (
       |  SELECT l_returnflag g, l_quantity x, l_extendedprice y
       |  FROM lineitem WHERE l_orderkey % 10 = 1),
       |mm AS (SELECT g, AVG(y) my, AVG(x) mx FROM t0 GROUP BY 1),
       |t AS (
       |  SELECT t0.g, x - mx x, y - my y
       |  FROM t0 JOIN mm ON t0.g = mm.g),
       |f0 AS (
       |  SELECT g, COVAR_POP(y, x)/VAR_POP(x) b,
       |    AVG(y) - COVAR_POP(y, x)/VAR_POP(x)*AVG(x) a, COUNT(*) n
       |  FROM t GROUP BY 1),
       |${iter(0)}
       |${iter(1)}
       |${iter(2)}
       |bf AS (
       |  SELECT t.g,
       |    AVG(CASE WHEN y - a - b*x <= 0 THEN 1.0 ELSE 0.0 END) below
       |  FROM t JOIN f3 ON t.g = f3.g GROUP BY 1)
       |SELECT f0.g AS l_returnflag, f0.n AS n,
       |  ROUND(f3.b, 4) AS slope,
       |  ROUND(f3.a + mm.my - f3.b*mm.mx, 2) AS intercept,
       |  ROUND(bf.below, 6) AS below_frac
       |FROM f0 JOIN f3 ON f0.g = f3.g JOIN bf ON f0.g = bf.g
       |  JOIN mm ON f0.g = mm.g
       |ORDER BY 1""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q_chow" ->
      """WITH a AS (
        |  SELECT l_returnflag g,
        |    CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END s,
        |    l_quantity x, l_extendedprice y
        |  FROM lineitem),
        |m AS (
        |  SELECT g,
        |    SUM(CASE WHEN s=1 THEN 1.0 END) n1,
        |    SUM(CASE WHEN s=1 THEN x END) sx1,
        |    SUM(CASE WHEN s=1 THEN y END) sy1,
        |    SUM(CASE WHEN s=1 THEN x*x END) sxx1,
        |    SUM(CASE WHEN s=1 THEN x*y END) sxy1,
        |    SUM(CASE WHEN s=1 THEN y*y END) syy1,
        |    SUM(CASE WHEN s=0 THEN 1.0 END) n2,
        |    SUM(CASE WHEN s=0 THEN x END) sx2,
        |    SUM(CASE WHEN s=0 THEN y END) sy2,
        |    SUM(CASE WHEN s=0 THEN x*x END) sxx2,
        |    SUM(CASE WHEN s=0 THEN x*y END) sxy2,
        |    SUM(CASE WHEN s=0 THEN y*y END) syy2,
        |    COUNT(*)::DOUBLE n, SUM(x) sx, SUM(y) sy,
        |    SUM(x*x) sxx, SUM(x*y) sxy, SUM(y*y) syy
        |  FROM a GROUP BY 1),
        |e AS (
        |  SELECT g, n1, n2, n,
        |    (syy1 - sy1*sy1/n1)
        |      - POWER(sxy1 - sx1*sy1/n1, 2)/(sxx1 - sx1*sx1/n1) sse1,
        |    (syy2 - sy2*sy2/n2)
        |      - POWER(sxy2 - sx2*sy2/n2, 2)/(sxx2 - sx2*sx2/n2) sse2,
        |    (syy - sy*sy/n)
        |      - POWER(sxy - sx*sy/n, 2)/(sxx - sx*sx/n) ssep
        |  FROM m)
        |SELECT g AS l_returnflag, n1::BIGINT AS n1, n2::BIGINT AS n2,
        |  ROUND(((ssep - sse1 - sse2)/2)
        |    / ((sse1 + sse2)/(n - 4)), 4) AS f_stat,
        |  2.0 AS df1, n - 4 AS df2
        |FROM e ORDER BY 1""".stripMargin,
    "q_partial_corr" ->
      """WITH c AS (
        |  SELECT l_returnflag g, COUNT(*)::DOUBLE n,
        |    CORR(l_quantity, l_extendedprice) rxy,
        |    CORR(l_quantity, l_discount) rxz,
        |    CORR(l_extendedprice, l_discount) ryz
        |  FROM lineitem GROUP BY 1),
        |p AS (
        |  SELECT g, n, rxy,
        |    (rxy - rxz*ryz)/SQRT((1 - rxz*rxz)*(1 - ryz*ryz)) rp
        |  FROM c)
        |SELECT g AS l_returnflag, n::BIGINT AS n,
        |  ROUND(rxy, 6) AS r_xy, ROUND(rp, 6) AS r_xy_z,
        |  ROUND(rp*SQRT((n - 3)/(1 - rp*rp)), 4) AS t
        |FROM p ORDER BY 1""".stripMargin,
    "q_mi_binned" ->
      """WITH t AS (
        |  SELECT event_type g, value x, user_id::DOUBLE y FROM events),
        |r AS (
        |  SELECT g, MIN(x) xlo, MAX(x) xhi, MIN(y) ylo, MAX(y) yhi
        |  FROM t GROUP BY 1),
        |b AS (
        |  SELECT t.g,
        |    CASE WHEN xhi <= xlo THEN 0
        |      ELSE LEAST(FLOOR((x - xlo)/(xhi - xlo)*12), 11) END bx1,
        |    CASE WHEN yhi <= ylo THEN 0
        |      ELSE LEAST(FLOOR((y - ylo)/(yhi - ylo)*12), 11) END by1
        |  FROM t JOIN r ON t.g = r.g),
        |c AS (SELECT g, bx1, by1, COUNT(*)::DOUBLE c FROM b GROUP BY 1,2,3),
        |p AS (
        |  SELECT g, c / SUM(c) OVER (PARTITION BY g) p,
        |    SUM(c) OVER (PARTITION BY g, bx1)
        |      / SUM(c) OVER (PARTITION BY g) px,
        |    SUM(c) OVER (PARTITION BY g, by1)
        |      / SUM(c) OVER (PARTITION BY g) py
        |  FROM c)
        |SELECT g AS event_type, 12 AS bins,
        |  ROUND(SUM(p*LN(p/(px*py))), 6) AS mi,
        |  ROUND(SUM(p*LN(p/(px*py)))
        |    / SQRT(SUM(-p*LN(px)) * SUM(-p*LN(py))), 6) AS nmi
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_quantile_reg" -> quantileSql
  )
}
