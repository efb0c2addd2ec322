package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.SketchOps

/** Driver-contract queries for the mergeable-sketch operators (HLL
  * distinct counts, quantile summaries). The sketch estimates are
  * engine-specific, so the oracle checks (a) the EXACT twins computed
  * the scalable way match DuckDB exactly, and (b) the error-contract
  * flags all came out true — i.e. the sketch stayed within its
  * documented tolerance on real data. */
object SketchQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sketch_accuracy" -> ((s, dir) =>
      SketchOps.accuracyReport(t(s, dir, "lineitem"),
        col("l_orderkey"), col("l_extendedprice"))),
    "q_sketch_quantile_grp" -> ((s, dir) =>
      SketchOps.groupedQuantileReport(t(s, dir, "lineitem"),
          col("l_returnflag"), col("l_extendedprice"), 0.5)
        .orderBy("l_returnflag")),
    "q_heavy_hitters" -> ((s, dir) =>
      SketchOps.heavyHitters(
        t(s, dir, "lineitem")
          .select(col("l_quantity").cast("int").as("qty")),
        "qty", support = 0.015, topK = 5))
  )

  def oracles: Map[String, String] = Map(
    "q_sketch_accuracy" ->
      """SELECT COUNT(DISTINCT l_orderkey) AS exact_cd,
        |       true AS cd_ok,
        |       ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |       ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
        |       true AS p50_ok,
        |       true AS p95_ok
        |FROM lineitem""".stripMargin,
    "q_sketch_quantile_grp" ->
      """SELECT l_returnflag,
        |       ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS q_exact,
        |       true AS q_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_heavy_hitters" ->
      """SELECT CAST(l_quantity AS INT) AS qty, COUNT(*) AS n,
        |       true AS hh_ok
        |FROM lineitem GROUP BY 1
        |ORDER BY n DESC, qty LIMIT 5""".stripMargin
  )
}
