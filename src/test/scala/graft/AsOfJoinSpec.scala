package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("backward as-of join: latest right at or before left time") {
    import spark.implicits._
    val left = Seq(
      ("a", 10L, 100L), ("a", 25L, 101L), ("a", 5L, 102L),
      ("b", 50L, 103L)).toDF("k", "t", "lid")
    val right = Seq(
      ("a", 10L, 1L, 1.5), ("a", 20L, 2L, 2.5), ("a", 20L, 3L, 3.5),
      ("c", 1L, 4L, 9.9)).toDF("k", "t", "rid", "v")
    val got = AsOfJoin.asofBackward(left, right, Seq("k"),
        col("t"), col("t"), col("v"), col("rid"))
      .select("lid", "asof_value").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(100L) == 1.5)  // right AT left time matches (≤)
    assert(got(101L) == 3.5)  // two rights tied at t=20 → last by rid
    assert(got(102L) == null) // nothing at or before t=5
    assert(got(103L) == null) // key with no right rows
  }

  test("tolerance nulls out matches further back than allowed") {
    import spark.implicits._
    val left = Seq(("a", 100L, 1L), ("a", 11L, 2L)).toDF("k", "t", "lid")
    val right = Seq(("a", 10L, 1L, 7.0)).toDF("k", "t", "rid", "v")
    val got = AsOfJoin.asofBackward(left, right, Seq("k"),
        col("t"), col("t"), col("v"), col("rid"),
        tolerance = Some(lit(5L)))
      .select("lid", "asof_value").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) == null) // 100 - 10 = 90 > 5
    assert(got(2L) == 7.0)  // 11 - 10 = 1 ≤ 5
  }

  test("plan: one hash partitioning on the key, no broadcast of facts") {
    import spark.implicits._
    val left = (0 until 100).map(i => ("k" + i % 5, i.toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = (0 until 100).map(i => ("k" + i % 5, i.toLong, i.toLong))
      .toDF("k", "t", "rid").withColumn("v", col("t") * 1.0)
    val plan = AsOfJoin.asofBackward(left, right, Seq("k"),
        col("t"), col("t"), col("v"), col("rid"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(k"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
