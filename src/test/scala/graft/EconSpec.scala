package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EconOps

/** Econometrics family: distributed statistics must equal local
  * loop/linear-algebra references on randomized series, and the tests
  * must behaviorally separate constructed positives from negatives
  * (unit root vs stationary, causal vs independent). */
class EconSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private val rnd = new scala.util.Random(13)
  private val n = 400
  // AR(1) with phi = 0.6 — stationary, known pacf shape
  private val ar1 = {
    val a = new Array[Double](n)
    a(0) = rnd.nextGaussian()
    for (i <- 1 until n) a(i) = 0.6 * a(i - 1) + rnd.nextGaussian()
    a
  }
  private def seriesDf(a: Array[Double]) =
    a.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
      .toDF("t", "x", "g")

  private def localAcf(a: Array[Double], m: Int): Array[Double] = {
    val mu = a.sum / a.length
    val s0 = a.map(v => (v - mu) * (v - mu)).sum
    (1 to m).map(k =>
      (k until a.length).map(t => (a(t) - mu) * (a(t - k) - mu)).sum / s0
    ).toArray
  }

  private def localDl(rho: Array[Double]): Array[Double] = {
    val m = rho.length
    val phi = Array.ofDim[Double](m + 1, m + 1)
    val out = new Array[Double](m)
    var v = 1.0
    for (k <- 1 to m) {
      var acc = rho(k - 1)
      for (j <- 1 until k) acc -= phi(k - 1)(j) * rho(k - j - 1)
      val pk = acc / v
      phi(k)(k) = pk
      for (j <- 1 until k) phi(k)(j) = phi(k - 1)(j) - pk * phi(k - 1)(k - j)
      v *= (1 - pk * pk); out(k - 1) = pk
    }
    out
  }

  test("acf + pacf match the local Durbin-Levinson recursion and the " +
      "AR(1) signature") {
    val r = EconOps.pacf(seriesDf(ar1), col("x"), col("t"), Seq("g"), 6)
      .collect()(0).getSeq[Double](1)
    val exp = localDl(localAcf(ar1, 6))
    for (i <- 0 until 6)
      assert(math.abs(r(i) - exp(i)) < 1e-10, s"lag ${i + 1}")
    // AR(1): pacf1 ~ phi, higher lags ~ 0
    assert(r(0) > 0.45 && r(0) < 0.75)
    for (i <- 1 until 6) assert(math.abs(r(i)) < 0.15, s"lag ${i + 1} ${r(i)}")
  }

  test("dickeyFuller separates a random walk from a stationary series" +
      " and matches the slope-t identity at lags=0") {
    val walk = ar1.scanLeft(0.0)(_ + _).drop(1)
    val sWalk = EconOps.dickeyFuller(seriesDf(walk), col("x"), col("t"),
      Seq("g"), 0).collect()(0)
    val sAr = EconOps.dickeyFuller(seriesDf(ar1), col("x"), col("t"),
      Seq("g"), 0).collect()(0)
    val (tWalk, tAr) = (sWalk.getDouble(2), sAr.getDouble(2))
    assert(tWalk > -2.86, s"walk should not reject: $tWalk")
    assert(tAr < -3.43, s"AR(1) should reject: $tAr")
    // identity: t(slope) = r sqrt((n-2)/(1-r^2)) on (dx, x_{t-1})
    val dx = ar1.sliding(2).map(p => p(1) - p(0)).toArray
    val xm1 = ar1.dropRight(1)
    val nn = dx.length
    val (mdx, mx) = (dx.sum / nn, xm1.sum / nn)
    val r = dx.zip(xm1).map { case (a, b) => (a - mdx) * (b - mx) }.sum /
      math.sqrt(dx.map(v => (v - mdx) * (v - mdx)).sum *
        xm1.map(v => (v - mx) * (v - mx)).sum)
    val tExp = r * math.sqrt((nn - 2) / (1 - r * r))
    assert(math.abs(tAr - tExp) < 1e-8, s"$tAr vs $tExp")
  }

  test("dickeyFuller with augmentation lags stays finite and keeps " +
      "the stationary/walk ordering") {
    val walk = ar1.scanLeft(0.0)(_ + _).drop(1)
    val tW = EconOps.dickeyFuller(seriesDf(walk), col("x"), col("t"),
      Seq("g"), 2).collect()(0).getDouble(2)
    val tA = EconOps.dickeyFuller(seriesDf(ar1), col("x"), col("t"),
      Seq("g"), 2).collect()(0).getDouble(2)
    assert(!tW.isNaN && !tA.isNaN && tA < tW)
    assert(tA < -3.43 && tW > -2.86)
  }

  test("grangerCausality flags a constructed causal link and not an " +
      "independent series; F matches the R^2 identity") {
    val x = Array.fill(n)(rnd.nextGaussian())
    val y = new Array[Double](n)
    for (i <- 1 until n)
      y(i) = 0.4 * y(i - 1) + 0.8 * x(i - 1) + 0.3 * rnd.nextGaussian()
    val z = Array.fill(n)(rnd.nextGaussian())
    def gdf(ys: Array[Double], xs: Array[Double]) =
      ys.indices.map(i => (i.toLong, ys(i), xs(i), "g"))
        .toDF("t", "y", "x", "g")
    val causal = EconOps.grangerCausality(gdf(y, x), col("y"), col("x"),
      col("t"), Seq("g"), 1).collect()(0)
    val indep = EconOps.grangerCausality(gdf(y, z), col("y"), col("x"),
      col("t"), Seq("g"), 1).collect()(0)
    assert(causal.getDouble(5) < 1e-6, s"causal p ${causal.getDouble(5)}")
    assert(indep.getDouble(5) > 0.001, s"indep p ${indep.getDouble(5)}")
    // identity check on the causal pair
    val yy = y.drop(1); val yl = y.dropRight(1); val xl = x.dropRight(1)
    def corr(a: Array[Double], b: Array[Double]) = {
      val (ma, mb) = (a.sum / a.length, b.sum / b.length)
      a.zip(b).map { case (u, v) => (u - ma) * (v - mb) }.sum /
        math.sqrt(a.map(v => (v - ma) * (v - ma)).sum *
          b.map(v => (v - mb) * (v - mb)).sum)
    }
    val (ry1, ry2, r12) = (corr(yy, yl), corr(yy, xl), corr(yl, xl))
    val r2r = ry1 * ry1
    val r2u = (ry1 * ry1 + ry2 * ry2 - 2 * ry1 * ry2 * r12) /
      (1 - r12 * r12)
    val fExp = (r2u - r2r) / ((1 - r2u) / (yy.length - 3))
    assert(math.abs(causal.getDouble(2) - fExp) < 1e-6 * fExp,
      s"${causal.getDouble(2)} vs $fExp")
  }

  test("ccf matches local shifted correlations and peaks at the " +
      "constructed lag") {
    val x = Array.fill(n)(rnd.nextGaussian())
    // y anticipates x by 2: y_t = x_{t+2} + noise, so y_{t-2} = x_t
    // + noise => the peak sits at positive shift ccf_p2
    val y = Array.tabulate(n)(i =>
      (if (i + 2 < n) x(i + 2) else 0.0) + 0.2 * rnd.nextGaussian())
    val d = x.indices.map(i => (i.toLong, x(i), y(i), "g"))
      .toDF("t", "x", "y", "g")
    val r = EconOps.ccf(d, col("x"), col("y"), col("t"), Seq("g"), 2)
      .collect()(0)
    // columns: g, ccf_m2, ccf_m1, ccf_0, ccf_p1, ccf_p2
    def localShift(k: Int): Double = {
      // corr(x_t, y_{t-k}); negative k uses future y
      val pairs = x.indices.flatMap { i =>
        val j = i - k
        if (j >= 0 && j < n) Some((x(i), y(j))) else None
      }
      val (a, b) = (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
      val (ma, mb) = (a.sum / a.length, b.sum / b.length)
      val cov = a.zip(b).map { case (u, v) => (u - ma) * (v - mb) }.sum /
        (a.length - 1)
      val sa = math.sqrt(a.map(v => (v - ma) * (v - ma)).sum / (a.length - 1))
      val sb = math.sqrt(b.map(v => (v - mb) * (v - mb)).sum / (b.length - 1))
      cov / (sa * sb)
    }
    val got = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5))
    val exp = Seq(-2, -1, 0, 1, 2).map(localShift)
    got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) < 1e-10, s"shift ${i - 2}: $g vs $e")
    }
    assert(r.getDouble(5) > 0.9, s"peak at p2 ${r.getDouble(5)}")
    assert(math.abs(r.getDouble(3)) < 0.2)
  }

  test("kpss matches the local Bartlett computation and separates " +
      "stationary from walk (null is REVERSED vs ADF)") {
    val walk = ar1.scanLeft(0.0)(_ + _).drop(1)
    def localKpss(a: Array[Double], l: Int): Double = {
      val nn = a.length
      val mu = a.sum / nn
      val e = a.map(_ - mu)
      val s = e.scanLeft(0.0)(_ + _).drop(1)
      val eta = s.map(v => v * v).sum / (nn.toDouble * nn)
      val g = (0 to l).map(j =>
        (j until nn).map(t => e(t) * e(t - j)).sum)
      val s2 = (g(0) + (1 to l).map(j =>
        2.0 * (1.0 - j.toDouble / (l + 1)) * g(j)).sum) / nn
      eta / s2
    }
    // white noise for the stationary side: AR(1) with few Bartlett
    // lags has the test's documented finite-sample size distortion
    val wn = {
      val g = new scala.util.Random(37)
      Array.fill(n)(g.nextGaussian())
    }
    val kAr = EconOps.kpss(seriesDf(ar1), col("x"), col("t"),
      Seq("g"), 4).collect()(0).getDouble(2)
    val kWn = EconOps.kpss(seriesDf(wn), col("x"), col("t"),
      Seq("g"), 4).collect()(0).getDouble(2)
    val kWalk = EconOps.kpss(seriesDf(walk), col("x"), col("t"),
      Seq("g"), 4).collect()(0).getDouble(2)
    assert(math.abs(kAr - localKpss(ar1, 4)) < 1e-10)
    assert(math.abs(kWn - localKpss(wn, 4)) < 1e-10)
    assert(math.abs(kWalk - localKpss(walk, 4)) < 1e-10)
    assert(kWn < 0.463, s"white noise should not reject: $kWn")
    assert(kWalk > 0.739, s"walk should reject: $kWalk")
  }

  test("engleGranger finds a constructed cointegrated pair and not " +
      "independent walks; t matches the local no-constant DF") {
    val g2 = new scala.util.Random(29)
    val xw = Array.iterate(0.0, n)(_ + 0.0).clone()
    var acc = 0.0
    for (i <- 0 until n) { acc += g2.nextGaussian(); xw(i) = acc }
    val yco = xw.map(v => 2.0 * v + 1.0 + 0.5 * g2.nextGaussian())
    var acc2 = 0.0
    val yind = Array.fill(n) { acc2 += g2.nextGaussian(); acc2 }
    def pdf(ys: Array[Double], xs: Array[Double]) =
      ys.indices.map(i => (i.toLong, ys(i), xs(i), "g"))
        .toDF("t", "y", "x", "g")
    val co = EconOps.engleGranger(pdf(yco, xw), col("y"), col("x"),
      col("t"), Seq("g")).collect()(0)
    val ind = EconOps.engleGranger(pdf(yind, xw), col("y"), col("x"),
      col("t"), Seq("g")).collect()(0)
    assert(co.getDouble(4) < -3.34, s"cointegrated: ${co.getDouble(4)}")
    assert(ind.getDouble(4) > -3.05, s"independent: ${ind.getDouble(4)}")
    assert(math.abs(co.getDouble(2) - 2.0) < 0.05)
    // local replica of the residual DF t
    val nn = n
    val mx = xw.sum / nn; val my = yco.sum / nn
    val b = xw.zip(yco).map { case (a, c) => (a - mx) * (c - my) }.sum /
      xw.map(v => (v - mx) * (v - mx)).sum
    val u = yco.indices.map(i => yco(i) - my - b * (xw(i) - mx)).toArray
    val um1 = u.dropRight(1); val du = u.sliding(2).map(p => p(1) - p(0)).toArray
    val sxy = du.zip(um1).map { case (a, c) => a * c }.sum
    val sxx = um1.map(v => v * v).sum
    val syy = du.map(v => v * v).sum
    val bb = sxy / sxx
    val tExp = bb / math.sqrt(((syy - bb * bb * sxx) / (du.length - 1)) / sxx)
    assert(math.abs(co.getDouble(4) - tExp) < 1e-8)
  }

  test("archLm flags constructed ARCH effects, passes white noise, " +
      "and matches the two-regressor R^2 identity") {
    val g3 = new scala.util.Random(31)
    val arch = new Array[Double](2000)
    var e2prev = 1.0
    for (i <- arch.indices) {
      val sig2 = 0.2 + 0.75 * e2prev
      arch(i) = math.sqrt(sig2) * g3.nextGaussian()
      e2prev = arch(i) * arch(i)
    }
    val white = Array.fill(2000)(g3.nextGaussian())
    def adf(a: Array[Double]) =
      a.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
        .toDF("t", "x", "g")
    val rA = EconOps.archLm(adf(arch), col("x"), col("t"), Seq("g"), 2)
      .collect()(0)
    val rW = EconOps.archLm(adf(white), col("x"), col("t"), Seq("g"), 2)
      .collect()(0)
    assert(rA.getDouble(4) < 1e-8, s"arch p ${rA.getDouble(4)}")
    assert(rW.getDouble(4) > 0.001, s"white p ${rW.getDouble(4)}")
    // identity on the arch series
    val mu = arch.sum / arch.length
    val e2 = arch.map(v => (v - mu) * (v - mu))
    val (yv, l1, l2) = (e2.drop(2), e2.drop(1).dropRight(1), e2.dropRight(2))
    def corr(a: Array[Double], b: Array[Double]) = {
      val (ma, mb) = (a.sum / a.length, b.sum / b.length)
      a.zip(b).map { case (u, v) => (u - ma) * (v - mb) }.sum /
        math.sqrt(a.map(v => (v - ma) * (v - ma)).sum *
          b.map(v => (v - mb) * (v - mb)).sum)
    }
    val (r1, r2, r12) = (corr(yv, l1), corr(yv, l2), corr(l1, l2))
    val r2u = (r1 * r1 + r2 * r2 - 2 * r1 * r2 * r12) / (1 - r12 * r12)
    val lmExp = yv.length * r2u
    assert(math.abs(rA.getDouble(2) - lmExp) < 1e-6 * lmExp,
      s"${rA.getDouble(2)} vs $lmExp")
  }
}
