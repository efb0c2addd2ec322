package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts for the properties that decide 100 TB
  * behavior — checked continuously, not just eyeballed once:
  *
  *  - filters and column pruning must reach the parquet scan
  *    (PushedFilters / ReadSchema),
  *  - aggregations must have a map-side partial phase,
  *  - the per-group coefficient join in prediction queries must
  *    broadcast (never shuffle the fact table),
  *  - global top-k must plan as TakeOrderedAndProject (per-partition
  *    top-k + driver merge), never a single-partition global sort.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("filter and projection push down to the parquet scan") {
    val plan = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_returnflag") === "A")
      .select(col("l_quantity"), col("l_extendedprice"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,A)]"),
      plan)
    // the scan must read exactly the 3 referenced columns, not all 16
    val schemaLine = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(schemaLine.contains("l_quantity") &&
      schemaLine.contains("l_returnflag") &&
      !schemaLine.contains("l_orderkey"), schemaLine)
  }

  test("q1_agg aggregates with a map-side partial phase") {
    val plan = SparkEntry.queries("q1_agg")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan) // partial_sum before exchange
  }

  test("lin_reg_pred joins per-group coefficients via broadcast") {
    val plan = SparkEntry.queries("q_lin_reg_pred")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("isKnnFrom finds the k-th threshold via TakeOrderedAndProject") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val plan = graft.knn.KnnOps.isKnnFrom(df, Seq(col("x")), Seq(0.0), 5,
        col("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // and the per-row comparison side must not contain a global sort
    assert(!plan.contains("Sort [_d"), plan)
  }

  test("exact dedup window partitions by fingerprint (no global window)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.text.TextOps.exactDedup(docs, col("text"),
        col("doc_id"))
      .queryExecution.executedPlan.toString
    // the row_number window must be keyed (hash-partitioned), not empty
    assert(plan.contains("hashpartitioning"), plan)
  }
}
