package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TSOps2
import graft.util.{Expander, Frames, PartitionHelper}

class UtilSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("Expander produces aliased metric columns") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (3.0, 4.0)).toDF("a", "b")
    val cols = Expander.expand(Seq("a", "b"), Expander.basicMetrics)
    val out = df.agg(cols.head, cols.tail: _*)
    assert(out.columns.contains("a_mean") && out.columns.contains("b_std"))
    assert(out.head.getAs[Double]("a_mean") == 2.0)
  }

  test("E string mappings: mapping-major order, single len column, " +
      "null_rate, customizer (expander.py:6-34)") {
    import spark.implicits._
    val df = Seq((1.0, 4.0), (3.0, 2.0)).toDF("a", "b")
    val cols = Expander.expand(Seq("a", "b"),
      Seq("min", "max", "len", "null_rate"), "_", "__len__",
      Map("max" -> (c => max(c) * 10)))
    val out = df.agg(cols.head, cols.tail: _*)
    // mapping-major like the reference: a_min, b_min, a_max, b_max, …
    assert(out.columns.toSeq == Seq("a_min", "b_min", "a_max", "b_max",
      "__len__", "a_null_rate", "b_null_rate"))
    val r = out.head
    assert(r.getAs[Double]("a_max") == 30.0) // customizer override
    assert(r.getAs[Long]("__len__") == 2L)
    assert(r.getAs[Double]("b_null_rate") == 0.0)
    intercept[IllegalArgumentException] {
      Expander.expand(Seq("a"), Seq("nope"))
    }
  }

  test("PartitionHelper: multi-column keys with separator, by=Nil " +
      "whole frame, non-str/bool rejected (partition.py:20-60)") {
    import spark.implicits._
    val df = Seq(("x", true, 1), ("x", false, 2), ("y", true, 3))
      .toDF("k1", "k2", "v")
    assert(PartitionHelper.keys(df, Seq("k1", "k2"), "|") ==
      Seq("x|false", "x|true", "y|true"))
    val parts = PartitionHelper.partitionBy(df, Seq("k1", "k2"))
    assert(parts.size == 3 && parts("x|true").count() == 1)
    assert(PartitionHelper.partitionBy(df, Nil)("df").count() == 3)
    intercept[IllegalArgumentException] {
      PartitionHelper.partitionBy(df, Seq("v"))
    }
  }

  test("PartitionHelper splits, applies and unions") {
    import spark.implicits._
    val df = Seq(("x", 1), ("y", 2), ("x", 3)).toDF("k", "v")
    assert(PartitionHelper.keys(df, "k") == Seq("x", "y"))
    val parts = PartitionHelper.partitionBy(df, "k")
    assert(parts("x").count() == 2 && parts("y").count() == 1)
    val doubled = PartitionHelper.applyAndUnion(df, "k")(
      _.withColumn("v", col("v") * 2))
    assert(doubled.agg(sum("v")).head.getLong(0) == 12L)
  }

  test("Frames.frame generates a named index") {
    val f = Frames.frame(spark, 5, "idx")
    assert(f.columns.toSeq == Seq("idx"))
    assert(f.count() == 5)
  }

  test("klEntropySeries tree path matches brute force across crossover") {
    var seed = 77L
    def next(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble
    }
    val pts = Seq.fill(600)(Seq(next() * 10, next() * 10))
    val treeSide = TSOps2.klEntropySeries(pts, 3) // n>512 → tree path
    // independent brute recomputation of the same estimator
    val arr = pts.map(_.toArray).toArray
    val n = arr.length
    var sumLog = 0.0
    for (i <- 0 until n) {
      val ds = (0 until n).filter(_ != i).map { j =>
        math.max(math.abs(arr(i)(0) - arr(j)(0)),
          math.abs(arr(i)(1) - arr(j)(1)))
      }.sorted
      sumLog += math.log(2.0 * ds(2))
    }
    val brute = TSOps2.digammaAsym(n.toDouble) - TSOps2.digamma3 +
      2 * (sumLog / n)
    assert(math.abs(treeSide - brute) < 1e-12,
      s"tree=$treeSide brute=$brute")
  }

  test("Guard.cappedSeries passes small groups and raises past the cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0 until 100).map(i => ("g" + (i % 2), i.toDouble))
      .toDF("g", "x")
    val collected = df.groupBy("g")
      .agg(graft.util.Guard.cappedSeries(
        collect_list(col("x")), "specOp", cap = 60).as("s"))
    // 50-element groups pass untouched
    assert(collected.collect().forall(_.getSeq[Double](1).length == 50))
    val tight = df.groupBy("g")
      .agg(graft.util.Guard.cappedSeries(
        collect_list(col("x")), "specOp", cap = 10).as("s"))
    val e = intercept[Exception] { tight.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("graft.specOp") &&
      m.contains("exceeds cap 10")), msgs(e).mkString(" | "))
  }
}
