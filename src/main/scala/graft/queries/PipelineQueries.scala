package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Blueprint, Pipeline}

/** Driver-contract queries for SURVEY §2.11 — fit/transform pipeline.
  * Each query materializes a Blueprint on a train frame and aggregates
  * the transformed output; the DuckDB oracle recomputes the same fit
  * statistics in CTEs. q_pipeline_json additionally round-trips the
  * pipeline through JSON before transforming, proving persistence. */
object PipelineQueries extends QueryPack {

  private def base(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .withColumn("bal",
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))

  private val baseSql =
    """SELECT *, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END bal
      |FROM customer""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline" -> ((s, dir) => {
      val train = base(s, dir)
      val pipe = Blueprint(train)
        .impute(Seq("bal"), "mean")
        .scale(Seq("bal"), "standard")
        .oneHotEncode(Seq("c_mktsegment"))
        .ordinalEncode(Seq("c_mktsegment"))
        .materialize()
      pipe.transform(base(s, dir))
        .groupBy((col("c_nationkey") % 5).as("grp"))
        .agg(
          round(avg(col("bal")), 6).as("avg_scaled"),
          round(stddev_samp(col("bal")), 6).as("sd_scaled"),
          sum(col("c_mktsegment_AUTOMOBILE")).as("n_auto"),
          sum(col("c_mktsegment_MACHINERY")).as("n_mach"),
          sum(col("c_mktsegment")).as("sum_ordinal"))
        .orderBy("grp")
    }),
    "q_pipeline_json" -> ((s, dir) => {
      val train = base(s, dir)
      val json = Blueprint(train)
        .winsorize(Seq("c_acctbal"), 0.1, 0.9)
        .robustScale(Seq("c_acctbal"))
        .polynomialFeatures(Seq("c_acctbal", "c_nationkey"))
        .filter("c_nationkey < 20")
        .materialize()
        .toJson
      Pipeline.fromJson(json).transform(base(s, dir))
        .groupBy(col("c_mktsegment"))
        .agg(
          round(avg(col("c_acctbal")), 6).as("avg_robust"),
          round(sum(col("c_acctbal_x_c_acctbal")), 4).as("sum_sq"),
          round(sum(col("c_acctbal_x_c_nationkey")), 4).as("sum_xn"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    }),
    "q_pipeline_target" -> ((s, dir) => {
      val train = base(s, dir)
        .withColumn("y", (col("c_acctbal") > 5000).cast("double"))
      val pipe = Blueprint(train)
        .targetEncode("c_mktsegment", "y", 100, 50.0)
        .woeEncode("c_nationkey", "y")
        .materialize()
      pipe.transform(train)
        .groupBy(col("y"))
        .agg(round(avg(col("c_mktsegment")), 6).as("avg_te"),
          round(avg(col("c_nationkey")), 6).as("avg_woe"))
        .orderBy("y")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_pipeline" ->
      s"""WITH b AS ($baseSql),
         |m1 AS (SELECT AVG(bal) v FROM b),
         |i AS (SELECT b.*, COALESCE(bal, m1.v) ib FROM b, m1),
         |m2 AS (SELECT AVG(ib) mu, STDDEV_POP(ib) sd FROM i),
         |tr AS (
         |  SELECT c_nationkey % 5 grp, (ib - m2.mu) / m2.sd sb,
         |    CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END h_auto,
         |    CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END h_mach,
         |    CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING'
         |      THEN 1 WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3
         |      WHEN 'MACHINERY' THEN 4 END ord
         |  FROM i, m2)
         |SELECT grp, ROUND(AVG(sb), 6) AS avg_scaled,
         |  ROUND(STDDEV_SAMP(sb), 6) AS sd_scaled,
         |  SUM(h_auto)::BIGINT AS n_auto, SUM(h_mach)::BIGINT AS n_mach,
         |  SUM(ord)::BIGINT AS sum_ordinal
         |FROM tr GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pipeline_json" ->
      s"""WITH b AS ($baseSql),
         |rk AS (SELECT c_acctbal v,
         |  ROW_NUMBER() OVER (ORDER BY c_acctbal) - 1 rn,
         |  COUNT(*) OVER () n FROM b WHERE c_acctbal IS NOT NULL),
         |q AS (SELECT
         |  MIN(CASE WHEN rn = CAST(ROUND(0.1*(n-1)) AS BIGINT)
         |    THEN v END) lo,
         |  MIN(CASE WHEN rn = CAST(ROUND(0.9*(n-1)) AS BIGINT)
         |    THEN v END) hi FROM rk),
         |w AS (SELECT b.*, LEAST(GREATEST(c_acctbal, q.lo), q.hi) wb
         |  FROM b, q),
         |rk2 AS (SELECT wb v, ROW_NUMBER() OVER (ORDER BY wb) - 1 rn,
         |  COUNT(*) OVER () n FROM w WHERE wb IS NOT NULL),
         |r AS (SELECT
         |  (MIN(CASE WHEN rn = CAST(FLOOR(0.25*(n-1)) AS BIGINT)
         |     THEN v END)
         |   + MIN(CASE WHEN rn = CAST(CEIL(0.25*(n-1)) AS BIGINT)
         |     THEN v END)) / 2.0 q1,
         |  (MIN(CASE WHEN rn = CAST(FLOOR(0.75*(n-1)) AS BIGINT)
         |     THEN v END)
         |   + MIN(CASE WHEN rn = CAST(CEIL(0.75*(n-1)) AS BIGINT)
         |     THEN v END)) / 2.0 q3 FROM rk2),
         |s AS (SELECT w.*, (wb - r.q1) / (r.q3 - r.q1) rb FROM w, r)
         |SELECT c_mktsegment,
         |  ROUND(AVG(rb), 6) AS avg_robust,
         |  ROUND(SUM(rb * rb), 4) AS sum_sq,
         |  ROUND(SUM(rb * c_nationkey), 4) AS sum_xn,
         |  COUNT(*) AS n
         |FROM s WHERE c_nationkey < 20
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pipeline_target" ->
      s"""WITH b AS (
         |  SELECT *, CASE WHEN c_acctbal > 5000 THEN 1.0 ELSE 0.0 END y
         |  FROM customer),
         |g AS (
         |  SELECT c_mktsegment v, COUNT(*) cnt, AVG(y) cp FROM b GROUP BY 1),
         |p AS (SELECT AVG(y) pr FROM b),
         |te AS (
         |  SELECT v, (1.0 / (1.0 + EXP(-(cnt - 100) / 50.0))) * cp
         |    + (1 - 1.0 / (1.0 + EXP(-(cnt - 100) / 50.0))) * p.pr e
         |  FROM g, p),
         |wc AS (
         |  SELECT c_nationkey v, SUM(y) ev, COUNT(*) - SUM(y) ne
         |  FROM b GROUP BY 1),
         |wt AS (SELECT SUM(ev) te_, SUM(ne) tn_ FROM wc),
         |woe AS (
         |  SELECT v, LN(((ev + 1.0) / (te_ + 2.0))
         |    / ((ne + 1.0) / (tn_ + 2.0))) w
         |  FROM wc, wt)
         |SELECT y, ROUND(AVG(te.e), 6) AS avg_te,
         |  ROUND(AVG(woe.w), 6) AS avg_woe
         |FROM b JOIN te ON te.v = b.c_mktsegment
         |JOIN woe ON woe.v = b.c_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
