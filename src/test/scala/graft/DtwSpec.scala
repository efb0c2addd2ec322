package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DTW aggregate: distributed result must equal the local full-matrix
  * DP (unbanded and banded), plus shape anchors (self-distance 0,
  * template discrimination). */
class DtwSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  /** Local full-matrix DTW with the same symmetric steps and band. */
  private def localDtw(xs: Array[Double], ys: Array[Double],
                       band: Int, p: Double): Double = {
    val n = xs.length; val m = ys.length
    val inf = Double.PositiveInfinity
    val d = Array.fill(n + 1, m + 1)(inf)
    d(0)(0) = 0.0
    for (i <- 1 to n) {
      val cj = i.toDouble * m / n
      val lo = if (band < 0) 1 else math.max(1, math.ceil(cj - band).toInt)
      val hi = if (band < 0) m else math.min(m, math.floor(cj + band).toInt)
      for (j <- lo to hi) {
        val c = math.pow(math.abs(xs(i - 1) - ys(j - 1)), p)
        d(i)(j) = c + math.min(d(i - 1)(j),
          math.min(d(i)(j - 1), d(i - 1)(j - 1)))
      }
    }
    d(n)(m)
  }

  private val rnd = new scala.util.Random(53)
  private val xs = Array.fill(80)(rnd.nextDouble() * 10)
  private lazy val df = xs.toSeq.zipWithIndex
    .map { case (v, i) => ("g", i.toLong, v) }.toDF("g", "t", "x")

  test("dtw matches the local full-matrix DP (unbanded, L1 and L2)") {
    val pat = Seq(1.0, 5.0, 9.0, 5.0, 1.0)
    for (p <- Seq(1.0, 2.0)) {
      val got = df.groupBy("g")
        .agg(graft.agg.DtwAgg.dtw(col("t"), col("x"), pat,
          costPow = p).as("d"))
        .collect()(0).getDouble(1)
      val want = localDtw(xs, pat.toArray, -1, p)
      assert(math.abs(got - want) < 1e-9, s"p=$p: $got vs $want")
    }
  }

  test("dtw matches the local DP with a Sakoe-Chiba band") {
    val pat = (0 until 40).map(i => i * 0.25)
    val got = df.groupBy("g")
      .agg(graft.agg.DtwAgg.dtw(col("t"), col("x"), pat, band = 3)
        .as("d")).collect()(0).getDouble(1)
    val want = localDtw(xs, pat.toArray, 3, 1.0)
    assert(math.abs(got - want) < 1e-9, s"$got vs $want")
  }

  test("dtw to the series' own values is zero; templates discriminate") {
    val ramp = (0 until 50).map(i => ("r", i.toLong, i / 5.0)) ++
      (0 until 50).map(i => ("f", i.toLong, 10.0 - i / 5.0))
    val d = ramp.toDF("g", "t", "x")
    val upPat = Seq(0.0, 2.5, 5.0, 7.5, 10.0)
    val rows = d.groupBy("g")
      .agg(graft.agg.DtwAgg.dtw(col("t"), col("x"), upPat).as("d"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // self-anchor: a perfectly matching 5-point subsample costs ~0
    assert(rows("r") < rows("f") / 4,
      s"rising series must match the rising template: $rows")
    val self = (0 until 5).map(i => ("s", i.toLong, upPat(i)))
      .toDF("g", "t", "x")
      .groupBy("g").agg(graft.agg.DtwAgg.dtw(col("t"), col("x"), upPat)
        .as("d")).collect()(0).getDouble(1)
    assert(self == 0.0)
  }

  test("series cap is loud") {
    val e = intercept[Exception] {
      System.setProperty("graft.maxDtwSeries", "10")
      try {
        df.groupBy("g")
          .agg(graft.agg.DtwAgg.dtw(col("t"), col("x"), Seq(1.0))
            .as("d")).collect()
      } finally System.clearProperty("graft.maxDtwSeries")
    }
    assert(e.getMessage.contains("maxDtwSeries") ||
      (e.getCause != null && e.getCause.getMessage != null &&
        e.getCause.getMessage.contains("maxDtwSeries")))
  }
}
