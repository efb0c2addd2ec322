package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.RobustOps

/** Driver-contract queries for the robust-regression family
  * (RobustOps). The fixed-iteration IRLS contract is replayed CTE by
  * CTE in DuckDB: OLS start, then per iteration an exact
  * median-|residual| scale and an M-weighted refit. */
object RobustQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_huber_reg" -> ((s, dir) => {
      RobustOps.huberReg(
          t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 1),
          col("l_extendedprice"),
          col("l_quantity"), Seq("l_returnflag"), maxIter = 2)
        .select(col("l_returnflag"), col("n"),
          round(col("slope"), 6).as("slope"),
          round(col("intercept"), 2).as("intercept"),
          round(col("scale"), 2).as("scale"))
        .orderBy("l_returnflag")
    }),
    "q_bisquare_reg" -> ((s, dir) => {
      RobustOps.bisquareReg(
          t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 1),
          col("l_extendedprice"),
          col("l_quantity"), Seq("l_linestatus"), maxIter = 2)
        .select(col("l_linestatus"), col("n"),
          round(col("slope"), 6).as("slope"),
          round(col("intercept"), 2).as("intercept"),
          round(col("scale"), 2).as("scale"))
        .orderBy("l_linestatus")
    })
  )

  // shared CTE skeleton: t(g,x,y) -> f0 (OLS) -> s0 -> f1 -> s1 -> f2
  // -> s2; only the weight expression differs between methods.
  private def irlsSql(table: String, g: String, y: String, x: String,
                      wExpr: String): String =
    s"""WITH t0 AS (SELECT $g g, $x x, $y y FROM $table
       |  WHERE l_orderkey % 10 = 1),
       |mm AS (SELECT g, AVG(y) my, AVG(x) mx FROM t0 GROUP BY 1),
       |t AS (
       |  SELECT t0.g, x - mx x, y - my y
       |  FROM t0 JOIN mm ON t0.g = mm.g),
       |f0 AS (
       |  SELECT g, COVAR_POP(y, x)/VAR_POP(x) b,
       |    AVG(y) - COVAR_POP(y, x)/VAR_POP(x)*AVG(x) a,
       |    COUNT(*) n
       |  FROM t GROUP BY 1),
       |s0 AS (
       |  SELECT t.g, MEDIAN(ABS(y - a - b*x))/0.6745 s
       |  FROM t JOIN f0 ON t.g = f0.g GROUP BY 1),
       |r0 AS (
       |  SELECT t.g, x, y,
       |    CASE WHEN s <= 0 THEN 1.0
       |      ELSE $wExpr END w
       |  FROM t JOIN f0 ON t.g = f0.g JOIN s0 ON t.g = s0.g),
       |f1 AS (
       |  SELECT g,
       |    (SUM(w*x*y) - SUM(w*x)*SUM(w*y)/SUM(w))
       |      / (SUM(w*x*x) - SUM(w*x)*SUM(w*x)/SUM(w)) b,
       |    SUM(w*y)/SUM(w)
       |      - (SUM(w*x*y) - SUM(w*x)*SUM(w*y)/SUM(w))
       |        / (SUM(w*x*x) - SUM(w*x)*SUM(w*x)/SUM(w))
       |        * SUM(w*x)/SUM(w) a
       |  FROM r0 GROUP BY 1),
       |s1 AS (
       |  SELECT t.g, MEDIAN(ABS(y - a - b*x))/0.6745 s
       |  FROM t JOIN f1 ON t.g = f1.g GROUP BY 1),
       |r1 AS (
       |  SELECT t.g, x, y,
       |    CASE WHEN s <= 0 THEN 1.0
       |      ELSE $wExpr END w
       |  FROM t JOIN f1 ON t.g = f1.g JOIN s1 ON t.g = s1.g),
       |f2 AS (
       |  SELECT g,
       |    (SUM(w*x*y) - SUM(w*x)*SUM(w*y)/SUM(w))
       |      / (SUM(w*x*x) - SUM(w*x)*SUM(w*x)/SUM(w)) b,
       |    SUM(w*y)/SUM(w)
       |      - (SUM(w*x*y) - SUM(w*x)*SUM(w*y)/SUM(w))
       |        / (SUM(w*x*x) - SUM(w*x)*SUM(w*x)/SUM(w))
       |        * SUM(w*x)/SUM(w) a
       |  FROM r1 GROUP BY 1),
       |s2 AS (
       |  SELECT t.g, MEDIAN(ABS(y - a - b*x))/0.6745 s
       |  FROM t JOIN f2 ON t.g = f2.g GROUP BY 1)
       |SELECT f0.g AS ${g}, f0.n AS n,
       |  ROUND(f2.b, 6) AS slope,
       |  ROUND(f2.a + mm.my - f2.b*mm.mx, 2) AS intercept,
       |  ROUND(s2.s, 2) AS scale
       |FROM f0 JOIN f2 ON f0.g = f2.g JOIN s2 ON f0.g = s2.g
       |  JOIN mm ON f0.g = mm.g
       |ORDER BY 1""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_huber_reg" -> irlsSql("lineitem", "l_returnflag",
      "l_extendedprice", "l_quantity",
      "LEAST(1.0, 1.0/ABS((y - a - b*x)/(s*1.345)))"),
    "q_bisquare_reg" -> irlsSql("lineitem", "l_linestatus",
      "l_extendedprice", "l_quantity",
      """CASE WHEN ABS((y - a - b*x)/(s*4.685)) < 1
        | THEN POWER(1 - POWER((y - a - b*x)/(s*4.685), 2), 2)
        | ELSE 0.0 END""".stripMargin.replace("\n", ""))
  )
}
