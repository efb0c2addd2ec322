package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ScaleOps

class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("saltedAgg equals direct groupBy on every supported aggregate") {
    import spark.implicits._
    val df = (0 until 1000).map { i =>
      ("k" + (if (i % 10 == 0) 0 else i % 4), i.toDouble, i.toLong)
    }.toDF("k", "v", "c")
    val direct = df.groupBy("k").agg(
        sum("v").as("s"), avg("v").as("a"), min("v").as("mn"),
        max("v").as("mx"), count("c").as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5))).toMap
    val salted = ScaleOps.saltedAgg(df, Seq("k"), 7,
        Seq(("sum", "v", "s"), ("avg", "v", "a"), ("min", "v", "mn"),
          ("max", "v", "mx"), ("count", "c", "n")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5))).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, (s, a, mn, mx, n)) =>
      val (s2, a2, mn2, mx2, n2) = salted(k)
      assert(math.abs(s - s2) < 1e-6 && math.abs(a - a2) < 1e-9)
      assert(mn == mn2 && mx == mx2 && n == n2)
    }
  }

  test("binned range join equals cross-join filter, without cartesian plan") {
    import spark.implicits._
    val pts = (0 until 300).map(i => (i.toLong, (i % 97) * 1.37))
      .toDF("pid", "p")
    val ivs = (0 until 50).map { i =>
      val lo = (i % 31) * 3.1; (1000L + i, lo, lo + (i % 7) * 2.0)
    }.toDF("iid", "lo", "hi")
    val got = ScaleOps.binnedPointIntervalJoin(pts, "p", ivs, "lo", "hi",
        binWidth = 5.0)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = pts.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exp && exp.nonEmpty)
    val plan = ScaleOps.binnedPointIntervalJoin(pts, "p", ivs, "lo", "hi",
      binWidth = 5.0).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("binned interval-overlap join equals cross-join filter, once per pair") {
    import spark.implicits._
    // interval widths straddle the bin width (some zero-width, some
    // spanning many bins) to stress the canonical-bin dedup
    val l = (0 until 120).map { i =>
      val lo = (i % 37) * 1.9; (i.toLong, lo, lo + (i % 5) * 3.3)
    }.toDF("lid", "llo", "lhi")
    val r = (0 until 80).map { i =>
      val lo = (i % 29) * 2.3; (1000L + i, lo, lo + (i % 9) * 1.1)
    }.toDF("rid", "rlo", "rhi")
    val gotAll = ScaleOps.binnedIntervalOverlapJoin(l, "llo", "lhi",
        r, "rlo", "rhi", binWidth = 4.0)
      .select("lid", "rid").collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    // exactly once per qualifying pair — no multi-bin duplicates
    assert(gotAll.length == gotAll.toSet.size,
      s"${gotAll.length} rows vs ${gotAll.toSet.size} distinct pairs")
    val exp = l.crossJoin(r)
      .filter(col("lhi") >= col("rlo") && col("rhi") >= col("llo"))
      .select("lid", "rid").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(gotAll.toSet == exp && exp.nonEmpty)
  }

  test("topKPerGroup equals window row_number, including ties") {
    import spark.implicits._
    // scores collide heavily (i % 7) so tie-breaking is exercised; a
    // null-score row must be dropped, not crash the primitive encoder
    val df = (0 until 500).map(i =>
        ("g" + (i % 3), Some((i % 7).toDouble), i.toLong))
      .toDF("g", "s", "id")
      .union(Seq(("g0", None: Option[Double], 9999L)).toDF("g", "s", "id"))
    val got = ScaleOps.topKPerGroup(df, Seq(col("g")), col("s"),
        col("id"), 5)
      .select("g", "rk", "score", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val exp = df.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("s").desc, col("id"))))
      .filter(col("rk") <= 5)
      .select("g", "rk", "s", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got == exp && exp.size == 15)
  }

  test("applyNullPolicy: skip drops, zero/one impute, raise throws") {
    import spark.implicits._
    import graft.ops.LinRegOps
    val df = Seq((Some(1.0), 2.0), (None, 3.0), (Some(Double.NaN), 4.0),
      (Some(5.0), 6.0)).toDF("x", "y")
    val cols = Seq(col("x"))
    assert(LinRegOps.applyNullPolicy(df, cols, "skip").count() == 2)
    val zeroed = LinRegOps.applyNullPolicy(df, cols, "zero")
      .select("x").collect().map(_.getDouble(0)).sorted.toSeq
    assert(zeroed == Seq(0.0, 0.0, 1.0, 5.0))
    val oned = LinRegOps.applyNullPolicy(df, cols, "one")
      .select("x").collect().map(_.getDouble(0)).sorted.toSeq
    assert(oned == Seq(1.0, 1.0, 1.0, 5.0))
    intercept[IllegalArgumentException] {
      LinRegOps.applyNullPolicy(df, cols, "raise")
    }
    // clean frame passes through raise
    val clean = df.filter(col("x").isNotNull && !isnan(col("x")))
    assert(LinRegOps.applyNullPolicy(clean, cols, "raise").count() == 2)
  }
}
