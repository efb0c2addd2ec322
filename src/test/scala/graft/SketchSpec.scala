package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SketchOps

class SketchSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("accuracyReport: exact twins exact, sketch flags hold") {
    import spark.implicits._
    // 10k distinct keys, values 1..10000 → p50 = 5000.5, p95 = 9500.05
    val df = (1 to 10000).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    val row = SketchOps.accuracyReport(df, col("k"), col("v")).head()
    assert(row.getAs[Long]("exact_cd") == 10000L)
    assert(row.getAs[Double]("p50") == 5000.5)
    assert(row.getAs[Double]("p95") == 9500.05)
    assert(row.getAs[Boolean]("cd_ok"))
    assert(row.getAs[Boolean]("p50_ok"))
    assert(row.getAs[Boolean]("p95_ok"))
  }

  test("heavyHitters: containment holds past the sketch capacity; empty ok") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 200 distinct keys >> floor(1/0.015)=66 sketch slots; key 0 is a
    // genuine heavy hitter at ~6%, the rest uniform noise — containment
    // must survive counter evictions (the support/2 sizing)
    val df = (0 until 10000).map(i =>
      if (i % 16 == 0) 0L else (i % 199 + 1).toLong).toDF("k")
    val rows = graft.ops.SketchOps.heavyHitters(df, "k", 0.015, 3)
      .collect()
    assert(rows.forall(_.getAs[Boolean]("hh_ok")))
    assert(rows.head.getAs[Long]("k") == 0L)
    val empty = graft.ops.SketchOps.heavyHitters(
      df.filter(lit(false)), "k", 0.015, 3)
    assert(empty.count() == 0L)
  }

  test("groupedQuantileReport: per-group exact median + flag") {
    import spark.implicits._
    val df = (for (g <- Seq("a", "b"); i <- 1 to 101)
      yield (g, if (g == "a") i.toDouble else i * 2.0)).toDF("g", "v")
    val rows = SketchOps.groupedQuantileReport(df, col("g"), col("v"), 0.5)
      .orderBy("g").collect()
    assert(rows.map(_.getAs[Double]("q_exact")).toSeq == Seq(51.0, 102.0))
    assert(rows.forall(_.getAs[Boolean]("q_ok")))
  }
}
