package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Metrics
import graft.ops.MetricOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query result rounds floating-point outputs (6 decimals) and sorts
  * rows on the group key so the Spark and DuckDB sides are bit-comparable
  * despite differing float summation orders.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events table with a deterministic derived binary label + score,
    * identical arithmetic on the DuckDB side (see oracleSql). */
  private def scoredEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("y",
        (col("value") + col("event_id") % 7 > 52).cast("int"))
      .withColumn("p",
        least(col("value") / 350.0 + 0.001, lit(0.999)))

  private val scoredEventsSql =
    """SELECT event_type,
      |  CASE WHEN value + (event_id % 7) > 52 THEN 1 ELSE 0 END AS y,
      |  LEAST(value / 350.0 + 0.001, 0.999) AS p
      |FROM events""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_roc_auc")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q_roc_auc" -> ((s, dir) => {
      val df = scoredEvents(s, dir)
      MetricOps.rocAucNamed(df, col("y"), col("p"), Seq("event_type"))
        .withColumn("roc_auc", round(col("roc_auc"), 6))
        .orderBy("event_type")
    }),
    "q_log_loss" -> ((s, dir) => {
      scoredEvents(s, dir)
        .groupBy(col("event_type"))
        .agg(round(Metrics.logLoss(col("y"), col("p")), 6).as("log_loss"))
        .orderBy("event_type")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
        |  ROUND(AVG(l_discount), 6) AS avg_disc,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_roc_auc" ->
      s"""WITH t AS ($scoredEventsSql),
         |r AS (
         |  SELECT event_type, y,
         |    RANK() OVER (PARTITION BY event_type ORDER BY p)
         |      + (COUNT(*) OVER (PARTITION BY event_type, p) - 1) / 2.0
         |      AS ar
         |  FROM t)
         |SELECT event_type,
         |  ROUND((SUM(CASE WHEN y = 1 THEN ar END)
         |          - SUM(y) * (SUM(y) + 1) / 2.0)
         |        / (SUM(y) * (COUNT(*) - SUM(y))), 6) AS roc_auc
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_log_loss" ->
      s"""WITH t AS ($scoredEventsSql)
         |SELECT event_type,
         |  ROUND(-AVG(y * LN(LEAST(GREATEST(p, 1e-15), 1 - 1e-15))
         |    + (1 - y) * LN(1 - LEAST(GREATEST(p, 1e-15), 1 - 1e-15))), 6)
         |    AS log_loss
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
