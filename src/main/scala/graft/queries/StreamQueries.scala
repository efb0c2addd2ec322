package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.EncodeOps
import graft.pipeline.Blueprint
import graft.streaming.StreamOps

/** Driver-contract queries for time-bucketed aggregation (§1
  * group_by_dynamic_agg), the conditional/linear imputes (§2.11) and
  * PSI with fixed breakpoints (§2.6). */
object StreamQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dynamic_agg" -> ((s, dir) => {
      // route ts through eventTimeNanos so the query is correct under
      // BOTH testdata generations (nanos-as-long would silently parse
      // as epoch *seconds* under a bare cast("timestamp"))
      val ev0 = t(s, dir, "events")
      val ev = ev0.withColumn("etime", StreamOps.nanosToTimestamp(
        StreamOps.eventTimeNanos(ev0, col("ts"))))
      StreamOps.dynamicGroupByAgg(ev, col("etime"), "1 hour",
          Seq(col("event_type")),
          Seq(count(lit(1)).as("n"), round(sum(col("value")), 2)
            .as("sum_value")))
        .select(col("event_type"), col("window_start"), col("n"),
          col("sum_value"))
        .orderBy("event_type", "window_start")
    }),
    "q_pipeline_impute2" -> ((s, dir) => {
      val base = t(s, dir, "customer")
        .withColumn("bal",
          when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
      val pipe = Blueprint(base)
        .conditionalImpute(Seq("bal"), "c_nationkey < 10", "mean")
        .linearImpute("bal", "c_custkey")
        .materialize()
      pipe.transform(base)
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("bal")), 2).as("sum_bal"),
          count(when(col("bal").isNull, 1)).as("n_null"))
        .orderBy("c_mktsegment")
    }),
    "q_asof_join" -> ((s, dir) => {
      // for every click, the user's most recent purchase value at or
      // before the click time (backward as-of join; exact pair oracle)
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
      val purchases = ev.filter(col("event_type") === "purchase")
      graft.ops.AsOfJoin.asofBackward(clicks, purchases, Seq("user_id"),
          col("ts"), col("ts"), col("value"), col("event_id"),
          out = "lp")
        .select(col("event_id"), col("user_id"),
          round(col("lp"), 6).as("last_purchase"))
    }),
    "q_psi_breakpoints" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      EncodeOps.psiWithBreakpoints(
          ev.filter(col("event_type") === "click"), col("value"),
          ev.filter(col("event_type") =!= "click"), col("value"),
          Array(50.0, 100.0, 200.0, 300.0))
        .select(col("bucket"),
          round(col("baseline_pct"), 6).as("baseline_pct"),
          round(col("actual_pct"), 6).as("actual_pct"),
          round(col("psi_bin"), 8).as("psi_bin"))
    }),
    "q_sessionize" -> ((s, dir) => {
      // 30-minute-gap sessions per user; spans kept in integer
      // microseconds so Spark and the oracle never disagree on floats.
      // events.ts is timestamp[us]; sessionStats normalizes it to epoch
      // nanos internally (exactly what the oracle's epoch_ns(ts) does).
      val ev = t(s, dir, "events")
      graft.streaming.SessionOps.sessionStats(ev,
          Seq(col("user_id")), col("ts"), 30L * 60L * 1000000000L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_events"),
          sum(col("span_us")).as("total_span_us"))
        .orderBy("user_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_dynamic_agg" ->
      """SELECT event_type, date_trunc('hour', ts) AS window_start,
        |  COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_pipeline_impute2" ->
      """WITH b AS (
        |  SELECT *, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END
        |    bal
        |  FROM customer),
        |m1 AS (SELECT AVG(bal) v FROM b WHERE NOT (c_nationkey < 10)),
        |i1 AS (
        |  SELECT b.*, CASE WHEN c_nationkey < 10
        |    THEN m1.v ELSE bal END ib
        |  FROM b, m1),
        |r AS (
        |  SELECT
        |    (COUNT(*) * SUM(c_custkey * ib) - SUM(c_custkey) * SUM(ib))
        |      / (COUNT(*) * SUM(c_custkey * c_custkey)
        |        - SUM(c_custkey) * SUM(c_custkey)) sl,
        |    AVG(ib) my, AVG(c_custkey) mx
        |  FROM i1 WHERE ib IS NOT NULL),
        |f AS (
        |  SELECT i1.c_mktsegment,
        |    COALESCE(ib, r.sl * c_custkey + (r.my - r.sl * r.mx)) fb
        |  FROM i1, r)
        |SELECT c_mktsegment, ROUND(SUM(fb), 2) AS sum_bal,
        |  COUNT(CASE WHEN fb IS NULL THEN 1 END) AS n_null
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, 1 AS side, NULL::DOUBLE AS rv,
        |    event_id AS lid
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 0 AS side, value AS rv, NULL
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *, LAST_VALUE(rv IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, side, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) m
        |  FROM u)
        |SELECT lid AS event_id, user_id, ROUND(m, 6) AS last_purchase
        |FROM w WHERE side = 1""".stripMargin,
    "q_psi_breakpoints" ->
      """WITH bb AS (
        |  SELECT LEAST(CASE WHEN value <= 50.0 THEN 0
        |    WHEN value <= 100.0 THEN 1 WHEN value <= 200.0 THEN 2
        |    WHEN value <= 300.0 THEN 3 ELSE 4 END, 4) bucket
        |  FROM events WHERE event_type = 'click'),
        |ab AS (
        |  SELECT LEAST(CASE WHEN value <= 50.0 THEN 0
        |    WHEN value <= 100.0 THEN 1 WHEN value <= 200.0 THEN 2
        |    WHEN value <= 300.0 THEN 3 ELSE 4 END, 4) bucket
        |  FROM events WHERE event_type <> 'click'),
        |bp AS (
        |  SELECT bucket, COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM bb)
        |    baseline_pct FROM bb GROUP BY 1),
        |ap AS (
        |  SELECT bucket, COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM ab)
        |    actual_pct FROM ab GROUP BY 1)
        |SELECT bucket,
        |  ROUND(GREATEST(COALESCE(baseline_pct, 0), 0.0001), 6)
        |    AS baseline_pct,
        |  ROUND(GREATEST(COALESCE(actual_pct, 0), 0.0001), 6)
        |    AS actual_pct,
        |  ROUND((GREATEST(COALESCE(actual_pct, 0), 0.0001)
        |      - GREATEST(COALESCE(baseline_pct, 0), 0.0001))
        |    * LN(GREATEST(COALESCE(actual_pct, 0), 0.0001)
        |      / GREATEST(COALESCE(baseline_pct, 0), 0.0001)), 8)
        |    AS psi_bin
        |FROM bp FULL JOIN ap USING (bucket)
        |ORDER BY bucket""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) tn FROM events),
        |s AS (
        |  SELECT user_id, tn,
        |    CASE WHEN LAG(tn) OVER w IS NULL
        |      OR tn - LAG(tn) OVER w > 1800000000000 THEN 1 ELSE 0 END ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tn)),
        |s2 AS (
        |  SELECT user_id, tn, SUM(ns) OVER (
        |    PARTITION BY user_id ORDER BY tn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sid
        |  FROM s),
        |g AS (
        |  SELECT user_id, sid, COUNT(*) ne,
        |    (MAX(tn) - MIN(tn)) // 1000 span_us
        |  FROM s2 GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  SUM(ne)::BIGINT AS n_events, MAX(ne) AS max_events,
        |  SUM(span_us)::BIGINT AS total_span_us
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
