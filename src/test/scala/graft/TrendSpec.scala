package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.TrendAgg
import graft.ops.TrendOps

/** Mann–Kendall / Theil–Sen: the aggregator's O(n log n) S and
  * selection-by-bisection slope must equal the brute-force O(n²)
  * definition on randomized series (ties included), and the Spark op
  * must match the aggregator. */
class TrendSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def brute(ts: Array[Double], xs: Array[Double])
      : (Double, Double, Double) = {
    val n = ts.length
    var s = 0.0
    val slopes = scala.collection.mutable.ArrayBuffer[Double]()
    for (i <- 0 until n; j <- i + 1 until n) {
      s += math.signum(xs(j) - xs(i))
      slopes += (xs(j) - xs(i)) / (ts(j) - ts(i))
    }
    val sl = slopes.sorted
    val m = sl.length
    val slope =
      if (m % 2 == 1) sl(m / 2) else (sl(m / 2 - 1) + sl(m / 2)) / 2.0
    // tie-corrected variance
    var tieVar = 0.0
    xs.groupBy(identity).values.foreach { g =>
      val t = g.length.toDouble
      tieVar += t * (t - 1) * (2 * t + 5)
    }
    val varS = (n.toDouble * (n - 1) * (2 * n + 5) - tieVar) / 18.0
    (s, varS, slope)
  }

  test("aggregator S/var/slope == brute force over 60 random series " +
      "(with ties)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 60) {
      val n = 2 + rnd.nextInt(40)
      val ts = Array.tabulate(n)(_.toDouble + trial)
      // quantized values force ties; occasional monotone runs
      val xs = Array.tabulate(n)(k =>
        if (trial % 5 == 0) k + rnd.nextInt(3).toDouble
        else math.floor(rnd.nextDouble() * 8) / 2.0)
      val buf = scala.collection.mutable.ArrayBuffer(
        ts.zip(xs).toIndexedSeq: _*)
      val r = TrendAgg.finish(buf)
      val (bs, bv, bslope) = brute(ts, xs)
      assert(r.s == bs, s"trial $trial S: ${r.s} vs $bs")
      assert(math.abs(r.varS - bv) < 1e-9, s"trial $trial varS")
      assert(math.abs(r.slope - bslope) <= 1e-12 *
        math.max(1.0, math.abs(bslope)),
        s"trial $trial slope: ${r.slope} vs $bslope (n=$n)")
    }
  }

  test("duplicate time values fail loud") {
    val buf = scala.collection.mutable.ArrayBuffer(
      (1.0, 2.0), (1.0, 3.0), (2.0, 4.0))
    val e = intercept[IllegalArgumentException](TrendAgg.finish(buf))
    assert(e.getMessage.contains("strictly increasing"))
  }

  test("mannKendall op: clear trend detects, shuffled noise does not") {
    import spark.implicits._
    val up = (1 to 50).map(i => ("up", i.toDouble, i * 2.0 + (i % 3)))
    val rnd = new scala.util.Random(7)
    val noise = (1 to 50).map(i => ("noise", i.toDouble,
      math.floor(rnd.nextDouble() * 100) / 10.0))
    val df = (up ++ noise).toDF("g", "t", "x")
    val r = TrendOps.mannKendall(df, col("t"), col("x"), Seq("g"))
      .select(col("g"), col("pvalue"), col("slope"))
      .collect().map(row => row.getString(0) ->
        (row.getDouble(1), row.getDouble(2))).toMap
    assert(r("up")._1 < 1e-6, "monotone trend: p ~ 0")
    assert(r("up")._2 > 1.9 && r("up")._2 < 2.1, "Sen slope ~ 2")
    assert(r("noise")._1 > 0.01, "shuffled noise: not significant")
  }

  test("ewmMean: truncated-window weights match a hand-rolled EWMA " +
      "prefix and normalize at the series head") {
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 4.0, 8.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "t", "x")
    val got = TrendOps.ewmMean(df, col("t"), col("x"), alpha = 0.5,
        span = 8, Seq("g"))
      .orderBy("__trend_t").select("ewm").as[Double].collect()
    // adjust=true EWMA: Σ(1-a)^k x_{t-k} / Σ(1-a)^k, full history < span
    val expect = xs.indices.map { t =>
      val w = (0 to t).map(k => math.pow(0.5, k))
      (0 to t).map(k => w(k) * xs(t - k)).sum / w.sum
    }
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"$g vs $e")
    }
  }

  test("brownDouble: nested EWM replay + linear series recovers its " +
      "slope as the trend") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val xs = Array.tabulate(120)(i => 5.0 + 1.5 * i +
      rnd.nextGaussian() * 0.01)
    val df = xs.toSeq.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "t", "x")
    val rows = TrendOps.brownDouble(df, col("t"), col("x"), alpha = 0.4,
        span = 32, h = 2, Seq("g"))
      .orderBy("t").select("level", "trend", "forecast").collect()
    // local replay of the span-truncated head-normalized contract
    def ewm(v: Array[Double]): Array[Double] = v.indices.map { t =>
      val ks = 0 until math.min(32, t + 1)
      val w = ks.map(k => math.pow(0.6, k))
      ks.map(k => w(k) * v(t - k)).sum / w.sum
    }.toArray
    val s1 = ewm(xs); val s2 = ewm(s1)
    for (i <- xs.indices) {
      val lv = 2 * s1(i) - s2(i)
      val tr = 0.4 / 0.6 * (s1(i) - s2(i))
      assert(math.abs(rows(i).getDouble(0) - lv) < 1e-9)
      assert(math.abs(rows(i).getDouble(1) - tr) < 1e-9)
      assert(math.abs(rows(i).getDouble(2) - (lv + 2 * tr)) < 1e-9)
    }
    // steady state on a straight line: trend -> slope, forecast leads
    val last = rows.last
    assert(math.abs(last.getDouble(1) - 1.5) < 0.05,
      s"trend ${last.getDouble(1)} should approach the true slope 1.5")
  }
}
