package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.PostHocOps

/** Driver-contract queries for the omnibus / post-hoc family
  * (PostHocOps). P-values (chi2 / t / normal CDFs) follow the DiagOps
  * convention: computed by the ops, asserted in PostHocSpec, excluded
  * from the oracle projections; every statistic, df and effect size
  * is replayed exactly in SQL. */
object PostHocQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_jarque_bera" -> ((s, dir) => {
      PostHocOps.jarqueBera(t(s, dir, "events"), col("value"),
          Seq("event_type"))
        .select(col("event_type"), col("n"),
          round(col("skewness"), 6).as("skewness"),
          round(col("ex_kurtosis"), 6).as("ex_kurtosis"),
          round(col("statistic"), 4).as("statistic"))
        .orderBy("event_type")
    }),
    "q_brunner_munzel" -> ((s, dir) => {
      PostHocOps.brunnerMunzel(
          t(s, dir, "events")
            .filter(col("event_type").isin("click", "view")),
          col("value"), col("event_type") === "click", Nil)
        .select(col("n1"), col("n2"),
          round(col("statistic"), 6).as("statistic"),
          round(col("df"), 4).as("df"),
          round(col("p_hat"), 6).as("p_hat"))
    }),
    "q_tukey_hsd" -> ((s, dir) => {
      PostHocOps.tukeyHsd(t(s, dir, "lineitem"), col("l_quantity"),
          col("l_returnflag"))
        .select(col("level_a"), col("level_b"), col("n_a"), col("n_b"),
          round(col("diff"), 6).as("diff"),
          round(col("se"), 6).as("se"),
          round(col("q"), 6).as("q"),
          col("df_error"))
        .orderBy("level_a", "level_b")
    }),
    "q_friedman" -> ((s, dir) => {
      PostHocOps.friedman(t(s, dir, "events"), col("value"),
          col("user_id") % 50, col("event_type"))
        .select(col("n_blocks"), col("k"),
          round(col("statistic"), 6).as("statistic"), col("df"))
    }),
    "q_cochran_q" -> ((s, dir) => {
      PostHocOps.cochranQ(t(s, dir, "events"), col("value") > 60.0,
          col("user_id") % 50, col("event_type"))
        .select(col("n_blocks"), col("k"),
          round(col("statistic"), 6).as("statistic"), col("df"))
    }),
    "q_bartlett" -> ((s, dir) => {
      PostHocOps.bartlett(t(s, dir, "events"), col("value"),
          col("event_type"), Nil)
        .select(col("n"), col("k"),
          round(col("statistic"), 6).as("statistic"), col("df"))
    }),
    "q_icc1" -> ((s, dir) => {
      PostHocOps.icc1(t(s, dir, "events"), col("value"),
          col("user_id"), Nil)
        .select(col("n"), col("k_targets"),
          round(col("msb"), 6).as("msb"),
          round(col("msw"), 6).as("msw"),
          round(col("icc1"), 6).as("icc1"))
    }),
    "q_grubbs" -> ((s, dir) => {
      PostHocOps.grubbs(t(s, dir, "events"), col("value"),
          Seq("event_type"))
        .select(col("event_type"), col("n"),
          round(col("g_stat"), 6).as("g_stat"),
          col("outlier_value"))
        .orderBy("event_type")
    }),
    "q_dunn" -> ((s, dir) => {
      PostHocOps.dunn(t(s, dir, "events"), col("value"),
          col("event_type"))
        .select(col("level_a"), col("level_b"),
          round(col("mean_rank_a"), 4).as("mean_rank_a"),
          round(col("mean_rank_b"), 4).as("mean_rank_b"),
          round(col("z"), 6).as("z"))
        .orderBy("level_a", "level_b")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_jarque_bera" ->
      """WITH m AS (
        |  SELECT event_type g, AVG(value) mu, COUNT(*)::DOUBLE n
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT g, AVG(POWER(value-mu,2)) m2, AVG(POWER(value-mu,3)) m3,
        |    AVG(POWER(value-mu,4)) m4, ANY_VALUE(n) n
        |  FROM events e JOIN m ON e.event_type = m.g GROUP BY 1)
        |SELECT g AS event_type, n::BIGINT AS n,
        |  ROUND(m3/POWER(m2,1.5), 6) AS skewness,
        |  ROUND(m4/(m2*m2) - 3, 6) AS ex_kurtosis,
        |  ROUND(n/6*(POWER(m3/POWER(m2,1.5),2)
        |    + POWER(m4/(m2*m2)-3,2)/4), 4) AS statistic
        |FROM a ORDER BY 1""".stripMargin,
    "q_brunner_munzel" ->
      """WITH t AS (
        |  SELECT value x,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END s
        |  FROM events WHERE event_type IN ('click', 'view')),
        |r AS (
        |  SELECT s,
        |    RANK() OVER (ORDER BY x)
        |      + (COUNT(*) OVER (PARTITION BY x) - 1)/2.0 r,
        |    RANK() OVER (PARTITION BY s ORDER BY x)
        |      + (COUNT(*) OVER (PARTITION BY s, x) - 1)/2.0 h
        |  FROM t),
        |a AS (
        |  SELECT SUM(CASE WHEN s=1 THEN 1 END)::DOUBLE n1,
        |    SUM(CASE WHEN s=0 THEN 1 END)::DOUBLE n2,
        |    SUM(CASE WHEN s=1 THEN r END) sr1,
        |    SUM(CASE WHEN s=0 THEN r END) sr2,
        |    SUM(CASE WHEN s=1 THEN (r-h)*(r-h) END) q1,
        |    SUM(CASE WHEN s=0 THEN (r-h)*(r-h) END) q2,
        |    SUM(CASE WHEN s=1 THEN r-h END) l1,
        |    SUM(CASE WHEN s=0 THEN r-h END) l2
        |  FROM r),
        |v AS (
        |  SELECT n1, n2, sr1, sr2,
        |    (q1 - l1*l1/n1)/(n1-1) s1, (q2 - l2*l2/n2)/(n2-1) s2
        |  FROM a)
        |SELECT n1::BIGINT AS n1, n2::BIGINT AS n2,
        |  ROUND(n1*n2*(sr2/n2 - sr1/n1)
        |    / ((n1+n2)*SQRT(n1*s1 + n2*s2)), 6) AS statistic,
        |  ROUND(POWER(n1*s1 + n2*s2, 2)
        |    / (POWER(n1*s1,2)/(n1-1) + POWER(n2*s2,2)/(n2-1)), 4) AS df,
        |  ROUND((sr2/n2 - (n2+1)/2)/n1, 6) AS p_hat
        |FROM v""".stripMargin,
    "q_tukey_hsd" ->
      """WITH lv AS (
        |  SELECT l_returnflag f, AVG(l_quantity) m, COUNT(*)::DOUBLE nf
        |  FROM lineitem GROUP BY 1),
        |e AS (
        |  SELECT SUM(POWER(l_quantity - m, 2)) sse, COUNT(*)::DOUBLE n,
        |    (SELECT COUNT(*) FROM lv)::DOUBLE k
        |  FROM lineitem l JOIN lv ON l.l_returnflag = lv.f)
        |SELECT a.f AS level_a, b.f AS level_b,
        |  a.nf::BIGINT AS n_a, b.nf::BIGINT AS n_b,
        |  ROUND(b.m - a.m, 6) AS diff,
        |  ROUND(SQRT(sse/(n-k)/2*(1/a.nf + 1/b.nf)), 6) AS se,
        |  ROUND(ABS(b.m - a.m)
        |    / SQRT(sse/(n-k)/2*(1/a.nf + 1/b.nf)), 6) AS q,
        |  n - k AS df_error
        |FROM lv a JOIN lv b ON a.f < b.f, e
        |ORDER BY 1, 2""".stripMargin,
    "q_friedman" ->
      """WITH cells AS (
        |  SELECT user_id % 50 b, event_type t, AVG(value) v
        |  FROM events GROUP BY 1, 2),
        |kk AS (SELECT COUNT(DISTINCT t)::DOUBLE k FROM cells),
        |f AS (
        |  SELECT b, t, v FROM cells
        |  QUALIFY COUNT(*) OVER (PARTITION BY b) = (SELECT k FROM kk)),
        |r AS (
        |  SELECT b, t,
        |    RANK() OVER (PARTITION BY b ORDER BY v)
        |      + (COUNT(*) OVER (PARTITION BY b, v) - 1)/2.0 r,
        |    COUNT(*) OVER (PARTITION BY b, v)::DOUBLE tc
        |  FROM f),
        |rj AS (SELECT t, SUM(r) rj FROM r GROUP BY 1),
        |s AS (SELECT SUM(rj*rj) ssbn, COUNT(*)::DOUBLE k FROM rj),
        |ti AS (
        |  SELECT SUM((tc*tc*tc - tc)/tc) tsum,
        |    COUNT(*)/(SELECT k FROM s) n
        |  FROM r)
        |SELECT n::BIGINT AS n_blocks, k::BIGINT AS k,
        |  ROUND((12/(n*k*(k+1))*ssbn - 3*n*(k+1))
        |    / (1 - tsum/(n*k*(k*k-1))), 6) AS statistic,
        |  k - 1 AS df
        |FROM s, ti""".stripMargin,
    "q_cochran_q" ->
      """WITH cells AS (
        |  SELECT user_id % 50 b, event_type t,
        |    MAX(CASE WHEN value > 60.0 THEN 1 ELSE 0 END)::DOUBLE v
        |  FROM events GROUP BY 1, 2),
        |kk AS (SELECT COUNT(DISTINCT t)::DOUBLE k FROM cells),
        |f AS (
        |  SELECT b, t, v FROM cells
        |  QUALIFY COUNT(*) OVER (PARTITION BY b) = (SELECT k FROM kk)),
        |gj AS (
        |  SELECT SUM(g*g) g2, SUM(g) tt, COUNT(*)::DOUBLE k
        |  FROM (SELECT t, SUM(v) g FROM f GROUP BY 1)),
        |li AS (
        |  SELECT SUM(l*l) l2, COUNT(*)::DOUBLE n
        |  FROM (SELECT b, SUM(v) l FROM f GROUP BY 1))
        |SELECT n::BIGINT AS n_blocks, k::BIGINT AS k,
        |  ROUND(k*(k-1)*(g2 - tt*tt/k)/(k*tt - l2), 6) AS statistic,
        |  k - 1 AS df
        |FROM gj, li""".stripMargin,
    "q_bartlett" ->
      """WITH lv AS (
        |  SELECT event_type f, VAR_SAMP(value) v, COUNT(*)::DOUBLE nf
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT SUM(nf) n, COUNT(*)::DOUBLE k,
        |    SUM((nf-1)*v) ssw, SUM((nf-1)*LN(v)) sl, SUM(1/(nf-1)) si
        |  FROM lv)
        |SELECT n::BIGINT AS n, k::BIGINT AS k,
        |  ROUND(((n-k)*LN(ssw/(n-k)) - sl)
        |    / (1 + (si - 1/(n-k))/(3*(k-1))), 6) AS statistic,
        |  k - 1 AS df
        |FROM a""".stripMargin,
    "q_icc1" ->
      """WITH lv AS (
        |  SELECT user_id t, SUM(value) sx, SUM(value*value) sxx,
        |    COUNT(*)::DOUBLE nf
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT SUM(nf) n, COUNT(*)::DOUBLE k, SUM(sx) gs,
        |    SUM(sxx) gss, SUM(sx*sx/nf) sb, SUM(nf*nf) sn2
        |  FROM lv),
        |m AS (
        |  SELECT n, k, (sb - gs*gs/n)/(k-1) msb, (gss - sb)/(n-k) msw,
        |    (n - sn2/n)/(k-1) k0
        |  FROM a)
        |SELECT n::BIGINT AS n, k::BIGINT AS k_targets,
        |  ROUND(msb, 6) AS msb, ROUND(msw, 6) AS msw,
        |  ROUND((msb - msw)/(msb + (k0-1)*msw), 6) AS icc1
        |FROM m""".stripMargin,
    "q_grubbs" ->
      """WITH m AS (
        |  SELECT event_type g, AVG(value) mu, STDDEV_SAMP(value) sd,
        |    COUNT(*) n
        |  FROM events GROUP BY 1),
        |z AS (
        |  SELECT e.event_type g, value,
        |    ABS(value - mu)/sd zz, n,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_type
        |      ORDER BY ABS(value - mu)/sd DESC, value DESC) pick
        |  FROM events e JOIN m ON e.event_type = m.g)
        |SELECT g AS event_type, n,
        |  ROUND(zz, 6) AS g_stat, value AS outlier_value
        |FROM z WHERE pick = 1 ORDER BY 1""".stripMargin,
    "q_dunn" ->
      """WITH r AS (
        |  SELECT event_type f,
        |    RANK() OVER (ORDER BY value)
        |      + (COUNT(*) OVER (PARTITION BY value) - 1)/2.0 r
        |  FROM events),
        |tie AS (
        |  SELECT SUM(c*c*c - c)::DOUBLE tsum, SUM(c)::DOUBLE nn
        |  FROM (SELECT COUNT(*)::DOUBLE c FROM events GROUP BY value)),
        |pl AS (
        |  SELECT f, AVG(r) rb, COUNT(*)::DOUBLE nf FROM r GROUP BY 1)
        |SELECT a.f AS level_a, b.f AS level_b,
        |  ROUND(a.rb, 4) AS mean_rank_a, ROUND(b.rb, 4) AS mean_rank_b,
        |  ROUND((a.rb - b.rb)
        |    / SQRT((nn*(nn+1)/12 - tsum/(12*(nn-1)))
        |      * (1/a.nf + 1/b.nf)), 6) AS z
        |FROM pl a JOIN pl b ON a.f < b.f, tie
        |ORDER BY 1, 2""".stripMargin
  )
}
