package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DiagOps

/** Driver-contract queries for the diagnostics family (DiagOps):
  * portmanteau autocorrelation, signal complexity, randomness,
  * k-sample medians, CvM distance, heteroscedasticity, exact 2x2
  * independence, long-memory, scale reliability. P-values that DuckDB
  * cannot replay (chi2 / normal CDFs) are asserted in DiagOpsSpec and
  * excluded from the oracle projection, matching q_chi2's convention. */
object DiagQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ljung_box" -> ((s, dir) => {
      DiagOps.ljungBox(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"), 5)
        .select(col("event_type"), col("n"),
          round(col("statistic"), 4).as("statistic"),
          round(col("bp_statistic"), 4).as("bp_statistic"),
          col("df"))
        .orderBy("event_type")
    }),
    "q_hjorth" -> ((s, dir) => {
      DiagOps.hjorth(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"))
        .select(col("event_type"),
          round(col("activity"), 4).as("activity"),
          round(col("mobility"), 6).as("mobility"),
          round(col("complexity"), 6).as("complexity"))
        .orderBy("event_type")
    }),
    "q_runs_test" -> ((s, dir) => {
      DiagOps.runsTest(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"))
        .select(col("event_type"), col("n1"), col("n2"), col("runs"),
          round(col("statistic"), 6).as("statistic"))
        .orderBy("event_type")
    }),
    "q_mood_median" -> ((s, dir) => {
      DiagOps.moodMedian(t(s, dir, "events"), col("value"),
          Seq("event_type"))
        .select(round(col("statistic"), 6).as("statistic"), col("df"),
          round(col("grand_median"), 6).as("grand_median"))
    }),
    "q_cvm_2samp" -> ((s, dir) => {
      DiagOps.cvm2Samp(
          t(s, dir, "events")
            .filter(col("event_type").isin("click", "view"))
            .withColumn("g", lit(1)),
          col("value"), col("event_type") === "click", Seq("g"))
        .select(col("n1"), col("n2"),
          round(col("statistic"), 6).as("statistic"))
    }),
    "q_ad_2samp" -> ((s, dir) => {
      DiagOps.ad2Samp(
          t(s, dir, "events")
            .filter(col("event_type").isin("click", "view")),
          col("value"), col("event_type") === "click", Nil)
        .select(col("n1"), col("n2"),
          round(col("statistic"), 6).as("statistic"))
    }),
    "q_breusch_pagan" -> ((s, dir) => {
      DiagOps.breuschPagan(t(s, dir, "lineitem"),
          col("l_extendedprice"), col("l_quantity"),
          Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"),
          round(col("statistic"), 4).as("statistic"), col("df"))
        .orderBy("l_returnflag")
    }),
    "q_fisher_exact" -> ((s, dir) => {
      DiagOps.fisherExact(
          t(s, dir, "events")
            .filter(col("event_type").isin("click", "view")),
          col("event_type") === "click", col("value") > 50.0)
        .select(col("a"), col("b"), col("c"), col("d"),
          round(col("odds_ratio"), 6).as("odds_ratio"),
          round(col("pvalue"), 6).as("pvalue"))
    }),
    "q_hurst" -> ((s, dir) => {
      DiagOps.hurst(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"))
        .select(col("event_type"), round(col("hurst"), 6).as("hurst"))
        .orderBy("event_type")
    }),
    "q_cronbach" -> ((s, dir) => {
      DiagOps.cronbachAlpha(t(s, dir, "lineitem"),
          Seq(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")))
        .select(col("k"), round(col("alpha"), 6).as("alpha"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_ljung_box" ->
      """WITH m AS (
        |  SELECT event_type, AVG(value) mu, COUNT(*)::DOUBLE n
        |  FROM events GROUP BY 1),
        |l AS (
        |  SELECT event_type, value,
        |    LAG(value,1) OVER (PARTITION BY event_type ORDER BY event_id) l1,
        |    LAG(value,2) OVER (PARTITION BY event_type ORDER BY event_id) l2,
        |    LAG(value,3) OVER (PARTITION BY event_type ORDER BY event_id) l3,
        |    LAG(value,4) OVER (PARTITION BY event_type ORDER BY event_id) l4,
        |    LAG(value,5) OVER (PARTITION BY event_type ORDER BY event_id) l5
        |  FROM events),
        |s AS (
        |  SELECT l.event_type,
        |    SUM((value-mu)*(value-mu)) s0,
        |    SUM((value-mu)*(l1-mu)) s1, SUM((value-mu)*(l2-mu)) s2,
        |    SUM((value-mu)*(l3-mu)) s3, SUM((value-mu)*(l4-mu)) s4,
        |    SUM((value-mu)*(l5-mu)) s5,
        |    ANY_VALUE(n) n
        |  FROM l JOIN m USING (event_type) GROUP BY 1)
        |SELECT event_type, n::BIGINT AS n,
        |  ROUND(n*(n+2)*(POWER(s1/s0,2)/(n-1) + POWER(s2/s0,2)/(n-2)
        |    + POWER(s3/s0,2)/(n-3) + POWER(s4/s0,2)/(n-4)
        |    + POWER(s5/s0,2)/(n-5)), 4) AS statistic,
        |  ROUND(n*(POWER(s1/s0,2) + POWER(s2/s0,2) + POWER(s3/s0,2)
        |    + POWER(s4/s0,2) + POWER(s5/s0,2)), 4) AS bp_statistic,
        |  5.0 AS df
        |FROM s ORDER BY 1""".stripMargin,
    "q_hjorth" ->
      """WITH l AS (
        |  SELECT event_type, event_id, value,
        |    value - LAG(value,1) OVER (PARTITION BY event_type
        |      ORDER BY event_id) d1
        |  FROM events),
        |l2 AS (
        |  SELECT event_type, value, d1,
        |    d1 - LAG(d1,1) OVER (PARTITION BY event_type
        |      ORDER BY event_id) d2
        |  FROM l)
        |SELECT event_type,
        |  ROUND(VAR_POP(value), 4) AS activity,
        |  ROUND(SQRT(VAR_POP(d1)/VAR_POP(value)), 6) AS mobility,
        |  ROUND(SQRT(VAR_POP(d2)/VAR_POP(d1))
        |    / SQRT(VAR_POP(d1)/VAR_POP(value)), 6) AS complexity
        |FROM l2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_runs_test" ->
      """WITH med AS (
        |  SELECT event_type, MEDIAN(value) med FROM events GROUP BY 1),
        |s AS (
        |  SELECT e.event_type, e.event_id,
        |    CASE WHEN value > med THEN 1 ELSE 0 END b
        |  FROM events e JOIN med USING (event_type)
        |  WHERE value <> med),
        |c AS (
        |  SELECT event_type, b,
        |    CASE WHEN LAG(b) OVER (PARTITION BY event_type
        |      ORDER BY event_id) IS DISTINCT FROM b THEN 1 ELSE 0 END ch
        |  FROM s),
        |a AS (
        |  SELECT event_type, SUM(b)::DOUBLE n1,
        |    (COUNT(*) - SUM(b))::DOUBLE n2, SUM(ch)::DOUBLE r
        |  FROM c GROUP BY 1)
        |SELECT event_type, n1::BIGINT AS n1, n2::BIGINT AS n2,
        |  r::BIGINT AS runs,
        |  ROUND((r - (1 + 2*n1*n2/(n1+n2)))
        |    / SQRT(2*n1*n2*(2*n1*n2-(n1+n2))
        |      / (POWER(n1+n2,2)*(n1+n2-1))), 6) AS statistic
        |FROM a ORDER BY 1""".stripMargin,
    "q_mood_median" ->
      """WITH gm AS (SELECT MEDIAN(value) m FROM events),
        |c AS (
        |  SELECT event_type,
        |    SUM(CASE WHEN value > m THEN 1 ELSE 0 END)::DOUBLE a,
        |    SUM(CASE WHEN value <= m THEN 1 ELSE 0 END)::DOUBLE b
        |  FROM events, gm GROUP BY 1),
        |t AS (SELECT SUM(a) ta, SUM(b) tb, COUNT(*)::DOUBLE k FROM c)
        |SELECT
        |  ROUND(SUM(POWER(a - (a+b)*ta/(ta+tb), 2)/((a+b)*ta/(ta+tb))
        |    + POWER(b - (a+b)*tb/(ta+tb), 2)/((a+b)*tb/(ta+tb))), 6)
        |    AS statistic,
        |  ANY_VALUE(t.k) - 1.0 AS df,
        |  ROUND(ANY_VALUE(gm.m), 6) AS grand_median
        |FROM c, t, gm""".stripMargin,
    "q_cvm_2samp" ->
      """WITH t AS (
        |  SELECT value x,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END s1
        |  FROM events WHERE event_type IN ('click', 'view')),
        |v AS (
        |  SELECT x, SUM(s1)::DOUBLE c1, COUNT(*) - SUM(s1)::DOUBLE c2
        |  FROM t GROUP BY 1),
        |c AS (
        |  SELECT c1, c2,
        |    SUM(c1) OVER (ORDER BY x) f1, SUM(c2) OVER (ORDER BY x) f2,
        |    SUM(c1) OVER () n1, SUM(c2) OVER () n2
        |  FROM v)
        |SELECT ANY_VALUE(n1)::BIGINT AS n1, ANY_VALUE(n2)::BIGINT AS n2,
        |  ROUND(ANY_VALUE(n1)*ANY_VALUE(n2)
        |    / POWER(ANY_VALUE(n1)+ANY_VALUE(n2), 2)
        |    * SUM((c1+c2)*POWER(f1/n1 - f2/n2, 2)), 6) AS statistic
        |FROM c""".stripMargin,
    "q_ad_2samp" ->
      """WITH t AS (
        |  SELECT value x,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END s1
        |  FROM events WHERE event_type IN ('click', 'view')),
        |v AS (
        |  SELECT x, SUM(s1)::DOUBLE c1, COUNT(*) - SUM(s1)::DOUBLE c2
        |  FROM t GROUP BY 1),
        |c AS (
        |  SELECT c1, c2,
        |    SUM(c1) OVER (ORDER BY x) f1, SUM(c2) OVER (ORDER BY x) f2,
        |    SUM(c1) OVER () n1, SUM(c2) OVER () n2
        |  FROM v),
        |d AS (
        |  SELECT n1, n2, c1 + c2 cnt, f1/n1 - f2/n2 df,
        |    (f1 + f2)/(n1 + n2) h
        |  FROM c)
        |SELECT ANY_VALUE(n1)::BIGINT AS n1, ANY_VALUE(n2)::BIGINT AS n2,
        |  ROUND(ANY_VALUE(n1)*ANY_VALUE(n2)
        |    / POWER(ANY_VALUE(n1)+ANY_VALUE(n2), 2)
        |    * SUM(CASE WHEN h < 1 THEN cnt*df*df/(h*(1-h))
        |      ELSE 0 END), 6) AS statistic
        |FROM d""".stripMargin,
    "q_breusch_pagan" ->
      """WITH f AS (
        |  SELECT l_returnflag g,
        |    COVAR_POP(l_extendedprice, l_quantity)
        |      / VAR_POP(l_quantity) b1,
        |    AVG(l_extendedprice) my, AVG(l_quantity) mx,
        |    COUNT(*)::DOUBLE n
        |  FROM lineitem GROUP BY 1),
        |e AS (
        |  SELECT f.g,
        |    POWER(l_extendedprice - my - b1*(l_quantity - mx), 2) e2,
        |    l_quantity x, n
        |  FROM lineitem l JOIN f ON l.l_returnflag = f.g)
        |SELECT g AS l_returnflag, ANY_VALUE(n)::BIGINT AS n,
        |  ROUND(ANY_VALUE(n)*POWER(CORR(e2, x), 2), 4) AS statistic,
        |  1.0 AS df
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_fisher_exact" ->
      """WITH t AS (
        |  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END r,
        |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END c
        |  FROM events WHERE event_type IN ('click', 'view')),
        |m AS (
        |  SELECT SUM(r*c)::BIGINT a, SUM(r*(1-c))::BIGINT b,
        |    SUM((1-r)*c)::BIGINT c2, SUM((1-r)*(1-c))::BIGINT d
        |  FROM t),
        |s AS (SELECT a, b, c2, d, a+b r1, c2+d r2, a+c2 kk,
        |    a+b+c2+d nn FROM m),
        |g AS (SELECT ROW_NUMBER() OVER () - 1 AS i FROM events),
        |p AS (
        |  SELECT s.*, g.i,
        |    EXP(lgamma(r1+1.0)-lgamma(i+1.0)-lgamma(r1-i+1.0)
        |      + lgamma(r2+1.0)-lgamma(kk-i+1.0)-lgamma(r2-kk+i+1.0)
        |      - (lgamma(nn+1.0)-lgamma(kk+1.0)-lgamma(nn-kk+1.0))) pp
        |  FROM s JOIN g
        |    ON g.i >= GREATEST(0, s.kk - s.r2)
        |   AND g.i <= LEAST(s.kk, s.r1)),
        |o AS (SELECT pp po FROM p WHERE i = a)
        |SELECT ANY_VALUE(a) AS a, ANY_VALUE(b) AS b,
        |  ANY_VALUE(c2) AS c, ANY_VALUE(d) AS d,
        |  ROUND(ANY_VALUE(a)::DOUBLE*ANY_VALUE(d)
        |    / (ANY_VALUE(b)::DOUBLE*ANY_VALUE(c2)), 6) AS odds_ratio,
        |  ROUND(LEAST(SUM(CASE WHEN pp <= (SELECT po FROM o)*(1+1e-7)
        |    THEN pp ELSE 0 END), 1.0), 6) AS pvalue
        |FROM p""".stripMargin,
    "q_hurst" ->
      """WITH base AS (
        |  SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY event_id) rn
        |  FROM events),
        |sized AS (
        |  SELECT event_type, value, rn, s.size,
        |    CAST(FLOOR((rn-1)/s.size) AS BIGINT) chunk
        |  FROM base, (SELECT UNNEST([8,16,32,64,128]) AS size) s),
        |d1 AS (
        |  SELECT event_type, size, chunk, rn, value,
        |    AVG(value) OVER (PARTITION BY event_type, size, chunk) m,
        |    COUNT(*) OVER (PARTITION BY event_type, size, chunk) cnt
        |  FROM sized),
        |d2 AS (
        |  SELECT event_type, size, chunk, value,
        |    SUM(value - m) OVER (PARTITION BY event_type, size, chunk
        |      ORDER BY rn) cd
        |  FROM d1 WHERE cnt = size),
        |rs AS (
        |  SELECT event_type, size,
        |    (MAX(cd) - MIN(cd)) rng, STDDEV_POP(value) sd
        |  FROM d2 GROUP BY event_type, size, chunk),
        |mrs AS (
        |  SELECT event_type, size, AVG(rng/sd) mrs
        |  FROM rs WHERE sd > 0 GROUP BY 1, 2)
        |SELECT event_type,
        |  ROUND(COVAR_POP(LN(mrs), LN(size))/VAR_POP(LN(size)), 6)
        |    AS hurst
        |FROM mrs GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cronbach" ->
      """SELECT 4 AS k,
        |  ROUND(4.0/3.0 * (1 - (VAR_SAMP(l_quantity)
        |    + VAR_SAMP(l_extendedprice) + VAR_SAMP(l_discount)
        |    + VAR_SAMP(l_tax))
        |    / VAR_SAMP(l_quantity + l_extendedprice + l_discount
        |      + l_tax)), 6) AS alpha
        |FROM lineitem""".stripMargin
  )
}
