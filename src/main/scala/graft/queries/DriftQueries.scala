package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DriftOps

/** Driver-contract queries for the distribution-drift family
  * (DriftOps): exact ECDF-integral distances (Wasserstein-1 / Cramer /
  * energy), shared-binning histogram divergences (JS / restricted KL /
  * total variation), and the linear-time MMD estimator over the
  * embeddings table. q_wasserstein exercises the ungrouped
  * (GlobalCumsum) path, q_drift_grp the group-keyed window path. */
object DriftQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_wasserstein" -> ((s, dir) => {
      DriftOps.ecdfDistances(
          t(s, dir, "events")
            .filter(col("event_type").isin("click", "view")),
          col("value"), col("event_type") === "click", Nil)
        .select(col("n1"), col("n2"),
          round(col("wasserstein"), 6).as("wasserstein"),
          round(col("cramer"), 6).as("cramer"),
          round(col("energy"), 6).as("energy"))
    }),
    "q_drift_grp" -> ((s, dir) => {
      DriftOps.ecdfDistances(t(s, dir, "events"), col("value"),
          col("user_id") % 2 === 0, Seq("event_type"))
        .select(col("event_type"), col("n1"), col("n2"),
          round(col("wasserstein"), 6).as("wasserstein"),
          round(col("energy"), 6).as("energy"))
        .orderBy("event_type")
    }),
    "q_js_div" -> ((s, dir) => {
      DriftOps.histDivergences(t(s, dir, "lineitem"),
          col("l_extendedprice"), col("l_returnflag") === "R",
          Seq("l_linestatus"), 20)
        .select(col("l_linestatus"), col("bins"),
          round(col("js_div"), 6).as("js_div"),
          round(col("kl_pq"), 6).as("kl_pq"),
          round(col("kl_qp"), 6).as("kl_qp"),
          round(col("tv_dist"), 6).as("tv_dist"))
        .orderBy("l_linestatus")
    }),
    "q_mmd_linear" -> ((s, dir) => {
      DriftOps.mmdLinear(t(s, dir, "embeddings"), col("embedding"),
          col("vec_id"), col("label") < 5, 1.0 / 64)
        .select(col("m_pairs"),
          round(col("mmd2"), 8).as("mmd2"),
          round(col("mmd"), 6).as("mmd"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_wasserstein" ->
      """WITH t AS (
        |  SELECT value x,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END s1
        |  FROM events WHERE event_type IN ('click', 'view')),
        |v AS (
        |  SELECT x, SUM(s1)::DOUBLE c1, COUNT(*) - SUM(s1)::DOUBLE c2
        |  FROM t GROUP BY 1),
        |c AS (
        |  SELECT x, LEAD(x) OVER (ORDER BY x) nx,
        |    SUM(c1) OVER (ORDER BY x) f1, SUM(c2) OVER (ORDER BY x) f2,
        |    SUM(c1) OVER () n1, SUM(c2) OVER () n2
        |  FROM v),
        |d AS (
        |  SELECT n1, n2, COALESCE(nx - x, 0) dx, f1/n1 - f2/n2 df
        |  FROM c)
        |SELECT ANY_VALUE(n1)::BIGINT AS n1, ANY_VALUE(n2)::BIGINT AS n2,
        |  ROUND(SUM(ABS(df) * dx), 6) AS wasserstein,
        |  ROUND(SUM(df * df * dx), 6) AS cramer,
        |  ROUND(SQRT(2 * SUM(df * df * dx)), 6) AS energy
        |FROM d""".stripMargin,
    "q_drift_grp" ->
      """WITH t AS (
        |  SELECT event_type g, value x,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END s1
        |  FROM events),
        |v AS (
        |  SELECT g, x, SUM(s1)::DOUBLE c1, COUNT(*) - SUM(s1)::DOUBLE c2
        |  FROM t GROUP BY 1, 2),
        |c AS (
        |  SELECT g, x, LEAD(x) OVER (PARTITION BY g ORDER BY x) nx,
        |    SUM(c1) OVER (PARTITION BY g ORDER BY x) f1,
        |    SUM(c2) OVER (PARTITION BY g ORDER BY x) f2,
        |    SUM(c1) OVER (PARTITION BY g) n1,
        |    SUM(c2) OVER (PARTITION BY g) n2
        |  FROM v),
        |d AS (
        |  SELECT g, n1, n2, COALESCE(nx - x, 0) dx, f1/n1 - f2/n2 df
        |  FROM c)
        |SELECT g AS event_type,
        |  ANY_VALUE(n1)::BIGINT AS n1, ANY_VALUE(n2)::BIGINT AS n2,
        |  ROUND(SUM(ABS(df) * dx), 6) AS wasserstein,
        |  ROUND(SQRT(2 * SUM(df * df * dx)), 6) AS energy
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_js_div" ->
      """WITH t AS (
        |  SELECT l_linestatus g, l_extendedprice x,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END s1
        |  FROM lineitem),
        |r AS (SELECT g, MIN(x) lo, MAX(x) hi FROM t GROUP BY 1),
        |b AS (
        |  SELECT t.g,
        |    CASE WHEN hi <= lo THEN 0
        |      ELSE LEAST(FLOOR((x - lo) / (hi - lo) * 20), 19) END bin,
        |    s1
        |  FROM t JOIN r ON t.g = r.g),
        |c AS (
        |  SELECT g, bin, SUM(s1)::DOUBLE c1,
        |    COUNT(*) - SUM(s1)::DOUBLE c2
        |  FROM b GROUP BY 1, 2),
        |p AS (
        |  SELECT g, c1 / SUM(c1) OVER (PARTITION BY g) p,
        |    c2 / SUM(c2) OVER (PARTITION BY g) q
        |  FROM c)
        |SELECT g AS l_linestatus, 20 AS bins,
        |  ROUND((SUM(CASE WHEN p > 0 THEN p*LN(p/((p+q)/2)) ELSE 0 END)
        |    + SUM(CASE WHEN q > 0 THEN q*LN(q/((p+q)/2)) ELSE 0 END))
        |    / 2, 6) AS js_div,
        |  ROUND(SUM(CASE WHEN p > 0 AND q > 0 THEN p*LN(p/q)
        |    ELSE 0 END), 6) AS kl_pq,
        |  ROUND(SUM(CASE WHEN p > 0 AND q > 0 THEN q*LN(q/p)
        |    ELSE 0 END), 6) AS kl_qp,
        |  ROUND(SUM(ABS(p - q)) / 2, 6) AS tv_dist
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mmd_linear" ->
      """WITH x AS (
        |  SELECT embedding::DOUBLE[] v,
        |    ROW_NUMBER() OVER (ORDER BY vec_id) rn
        |  FROM embeddings WHERE label < 5),
        |xp AS (
        |  SELECT CAST((rn-1)//2 AS BIGINT) pair,
        |    ARG_MIN(v, rn) x1, ARG_MAX(v, rn) x2
        |  FROM x GROUP BY 1 HAVING COUNT(*) = 2),
        |y AS (
        |  SELECT embedding::DOUBLE[] v,
        |    ROW_NUMBER() OVER (ORDER BY vec_id) rn
        |  FROM embeddings WHERE NOT (label < 5)),
        |yp AS (
        |  SELECT CAST((rn-1)//2 AS BIGINT) pair,
        |    ARG_MIN(v, rn) y1, ARG_MAX(v, rn) y2
        |  FROM y GROUP BY 1 HAVING COUNT(*) = 2),
        |h AS (
        |  SELECT EXP(-POWER(list_distance(x1, x2), 2) / 64)
        |    + EXP(-POWER(list_distance(y1, y2), 2) / 64)
        |    - EXP(-POWER(list_distance(x1, y2), 2) / 64)
        |    - EXP(-POWER(list_distance(x2, y1), 2) / 64) hh
        |  FROM xp JOIN yp USING (pair))
        |SELECT COUNT(*) AS m_pairs,
        |  ROUND(AVG(hh), 8) AS mmd2,
        |  ROUND(SQRT(GREATEST(AVG(hh), 0)), 6) AS mmd
        |FROM h""".stripMargin
  )
}
