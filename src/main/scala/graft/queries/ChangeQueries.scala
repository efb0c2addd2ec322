package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ChangeOps

/** Driver-contract queries for the offline changepoint family
  * (ChangeOps): Pettitt rank test, best mean-shift split, and the
  * Page-Hinkley drift replay, each per event_type over the event_id
  * order. Every statistic (including Pettitt's asymptotic p) is
  * replayed exactly in SQL. */
object ChangeQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pettitt" -> ((s, dir) => {
      ChangeOps.pettitt(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"))
        .select(col("event_type"), col("n"),
          round(col("k_stat"), 4).as("k_stat"),
          col("change_ord"),
          round(col("pvalue"), 6).as("pvalue"))
        .orderBy("event_type")
    }),
    "q_mean_shift" -> ((s, dir) => {
      ChangeOps.meanShiftSplit(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"))
        .select(col("event_type"), col("n"), col("change_ord"),
          round(col("gain"), 1).as("gain"),
          round(col("mean_left"), 6).as("mean_left"),
          round(col("mean_right"), 6).as("mean_right"))
        .orderBy("event_type")
    }),
    "q_page_hinkley" -> ((s, dir) => {
      ChangeOps.pageHinkley(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"), 1.0, 200.0)
        .select(col("event_type"), col("n"),
          round(col("ph_max"), 4).as("ph_max"),
          col("alarm_ord"), col("alarmed"))
        .orderBy("event_type")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_pettitt" ->
      """WITH r AS (
        |  SELECT event_type g, event_id o, value x,
        |    RANK() OVER (PARTITION BY event_type ORDER BY value)
        |      + (COUNT(*) OVER (PARTITION BY event_type, value) - 1)
        |        / 2.0 rk,
        |    COUNT(*) OVER (PARTITION BY event_type) n
        |  FROM events),
        |u AS (
        |  SELECT g, o, n,
        |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY o) rn,
        |    SUM(2*rk - n - 1) OVER (PARTITION BY g ORDER BY o) u
        |  FROM r),
        |f AS (
        |  SELECT g, n, o, ABS(u) au,
        |    ROW_NUMBER() OVER (PARTITION BY g
        |      ORDER BY ABS(u) DESC, rn ASC) pick
        |  FROM u WHERE rn < n)
        |SELECT g AS event_type, n::BIGINT AS n,
        |  ROUND(au, 4) AS k_stat, o AS change_ord,
        |  ROUND(LEAST(1.0, 2*EXP(-6*au*au/(POWER(n,3)+n*n))), 6)
        |    AS pvalue
        |FROM f WHERE pick = 1 ORDER BY 1""".stripMargin,
    "q_mean_shift" ->
      """WITH c AS (
        |  SELECT event_type g, event_id o,
        |    COUNT(*) OVER (PARTITION BY event_type)::DOUBLE n,
        |    SUM(value) OVER (PARTITION BY event_type) s,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY event_id)::DOUBLE rn,
        |    SUM(value) OVER (PARTITION BY event_type
        |      ORDER BY event_id) sl
        |  FROM events),
        |gn AS (
        |  SELECT g, o, n, rn, sl/rn ml, (s-sl)/(n-rn) mr,
        |    rn*(n-rn)/n * POWER(sl/rn - (s-sl)/(n-rn), 2) gain
        |  FROM c WHERE rn < n),
        |f AS (
        |  SELECT g, n, o, gain, ml, mr,
        |    ROW_NUMBER() OVER (PARTITION BY g
        |      ORDER BY gain DESC, rn ASC) pick
        |  FROM gn)
        |SELECT g AS event_type, n::BIGINT AS n, o AS change_ord,
        |  ROUND(gain, 1) AS gain, ROUND(ml, 6) AS mean_left,
        |  ROUND(mr, 6) AS mean_right
        |FROM f WHERE pick = 1 ORDER BY 1""".stripMargin,
    "q_page_hinkley" ->
      """WITH c AS (
        |  SELECT event_type g, event_id o,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY event_id)::DOUBLE rn,
        |    SUM(value) OVER (PARTITION BY event_type
        |      ORDER BY event_id) cs
        |  FROM events),
        |m AS (
        |  SELECT g, o,
        |    cs - SUM(cs/rn) OVER (PARTITION BY g ORDER BY o)
        |      - rn*1.0 m
        |  FROM c),
        |ph AS (
        |  SELECT g, o,
        |    m - MIN(m) OVER (PARTITION BY g ORDER BY o) ph
        |  FROM m)
        |SELECT g AS event_type, COUNT(*) AS n,
        |  ROUND(MAX(ph), 4) AS ph_max,
        |  MIN(CASE WHEN ph > 200.0 THEN o END) AS alarm_ord,
        |  MIN(CASE WHEN ph > 200.0 THEN o END) IS NOT NULL AS alarmed
        |FROM ph GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
