package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ChangeOps

/** Changepoint family: every distributed statistic must equal the
  * textbook O(n^2)/sequential local implementation on randomized
  * (tied) series, and each detector must locate a planted shift. */
class ChangeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private val rnd = new scala.util.Random(23)
  // planted mean shift at index 120 (0-based), with deliberate ties
  private val xs = Array.tabulate(200) { i =>
    val base = if (i < 120) 10.0 else 14.0
    base + rnd.nextInt(6) // integer noise -> many ties
  }
  private lazy val df = xs.toSeq.zipWithIndex
    .map { case (v, i) => (i.toLong, v, "g") }
    .toDF("o", "x", "g")

  private def one(d: org.apache.spark.sql.DataFrame) = d.collect()(0)

  test("pettitt matches the O(n^2) sign-pair definition with ties") {
    val r = one(ChangeOps.pettitt(df, col("x"), col("o"), Seq("g"))
      .select("k_stat", "change_ord", "pvalue", "n"))
    val n = xs.length
    def u(t: Int): Double = {
      var s = 0.0
      for (i <- 0 to t; j <- (t + 1) until n)
        s += math.signum(xs(i) - xs(j))
      s
    }
    val us = (0 until n - 1).map(u)
    val k = us.map(math.abs).max
    val argt = us.indexWhere(v => math.abs(v) == k)
    val p = math.min(1.0, 2 * math.exp(-6 * k * k /
      (math.pow(n, 3) + n.toDouble * n)))
    assert(r.getLong(3) == n)
    assert(math.abs(r.getDouble(0) - k) < 1e-9, s"K ${r.getDouble(0)} vs $k")
    assert(r.getLong(1) == argt.toLong, s"t ${r.getLong(1)} vs $argt")
    assert(math.abs(r.getDouble(2) - p) < 1e-12)
    // the planted shift is found near 120 and is significant
    assert(math.abs(r.getLong(1) - 119L) <= 3)
    assert(r.getDouble(2) < 0.01)
  }

  test("meanShiftSplit maximizes the between-segment SSE gain") {
    val r = one(ChangeOps.meanShiftSplit(df, col("x"), col("o"),
      Seq("g")).select("change_ord", "gain", "mean_left", "mean_right"))
    val n = xs.length
    def gain(t: Int): Double = { // t = left size
      val ml = xs.take(t).sum / t
      val mr = xs.drop(t).sum / (n - t)
      t.toDouble * (n - t) / n * (ml - mr) * (ml - mr)
    }
    val gains = (1 until n).map(gain)
    val g = gains.max
    val argt = gains.indexOf(g) + 1 // left size t -> last left idx t-1
    assert(r.getLong(0) == (argt - 1).toLong)
    assert(math.abs(r.getDouble(1) - g) < 1e-9)
    assert(math.abs(r.getDouble(2) - xs.take(argt).sum / argt) < 1e-9)
    assert(math.abs(r.getDouble(3) - xs.drop(argt).sum / (n - argt)) < 1e-9)
    assert(math.abs(r.getLong(0) - 119L) <= 1)
  }

  test("pageHinkley matches the sequential replay and alarms on the shift") {
    val delta = 0.1; val lambda = 30.0
    val r = one(ChangeOps.pageHinkley(df, col("x"), col("o"), Seq("g"),
      delta, lambda).select("ph_max", "alarm_ord", "alarmed"))
    var cs = 0.0; var mSum = 0.0; var m = 0.0
    var mMin = Double.MaxValue
    var phMax = Double.MinValue
    var alarm = -1L
    for (i <- xs.indices) {
      cs += xs(i)
      mSum += cs / (i + 1)
      m = cs - mSum - (i + 1) * delta
      mMin = math.min(mMin, m)
      val ph = m - mMin
      phMax = math.max(phMax, ph)
      if (ph > lambda && alarm < 0) alarm = i.toLong
    }
    assert(math.abs(r.getDouble(0) - phMax) < 1e-9)
    assert(r.getLong(1) == alarm)
    assert(r.getBoolean(2))
    assert(alarm >= 120L && alarm < 160L,
      s"alarm $alarm should trail the planted shift at 120")
  }

  test("pageHinkley stays quiet on a stationary series") {
    val quiet = Array.fill(300)(50.0 + rnd.nextGaussian()).toSeq
      .zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
      .toDF("o", "x", "g")
    val r = one(ChangeOps.pageHinkley(quiet, col("x"), col("o"),
      Seq("g"), 0.5, 30.0).select("alarmed"))
    assert(!r.getBoolean(0))
  }
}
