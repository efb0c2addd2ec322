package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AssocOps, RobustOps}

/** Association-structure family + quantile regression: local-loop
  * parity and analytic anchors (planted break, pure confound, y = x
  * gives nmi = 1, the quantile property). */
class AssocSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private val rnd = new scala.util.Random(71)
  private def one(d: org.apache.spark.sql.DataFrame) = d.collect()(0)

  test("chowTest detects a planted slope break; stable relationship " +
      "stays insignificant") {
    // regime 1: y = 1 + 2x; regime 2: y = 1 + 5x
    val broken = Array.tabulate(400) { i =>
      val x = rnd.nextDouble() * 10
      val s = i < 200
      val y = 1.0 + (if (s) 2.0 else 5.0) * x + rnd.nextGaussian() * 0.5
      (y, x, s, "g")
    }.toSeq.toDF("y", "x", "s", "g")
    val rb = one(AssocOps.chowTest(broken, col("y"), col("x"), col("s"),
      Seq("g")).select("f_stat", "pvalue"))
    assert(rb.getDouble(0) > 100, s"break F ${rb.getDouble(0)}")
    assert(rb.getDouble(1) < 1e-9)
    val stable = Array.tabulate(400) { i =>
      val x = rnd.nextDouble() * 10
      (1.0 + 2.0 * x + rnd.nextGaussian() * 0.5, x, i < 200, "g")
    }.toSeq.toDF("y", "x", "s", "g")
    val rs = one(AssocOps.chowTest(stable, col("y"), col("x"), col("s"),
      Seq("g")).select("pvalue"))
    assert(rs.getDouble(0) > 0.001)
  }

  test("chowTest matches the local closed form") {
    val data = Array.tabulate(300) { i =>
      (rnd.nextDouble() * 10 + i % 3, rnd.nextDouble() * 5, i % 2 == 0)
    }
    val df = data.toSeq.map { case (y, x, s) => (y, x, s, "g") }
      .toDF("y", "x", "s", "g")
    val r = one(AssocOps.chowTest(df, col("y"), col("x"), col("s"),
      Seq("g")).select("f_stat"))
    def sse(pts: Seq[(Double, Double)]): Double = {
      val n = pts.length
      val sx = pts.map(_._2).sum; val sy = pts.map(_._1).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val syy = pts.map(p => p._1 * p._1).sum
      (syy - sy * sy / n) -
        math.pow(sxy - sx * sy / n, 2) / (sxx - sx * sx / n)
    }
    val s1 = sse(data.filter(_._3).map(p => (p._1, p._2)).toSeq)
    val s2 = sse(data.filterNot(_._3).map(p => (p._1, p._2)).toSeq)
    val sp = sse(data.map(p => (p._1, p._2)).toSeq)
    val n = data.length
    val f = ((sp - s1 - s2) / 2) / ((s1 + s2) / (n - 4))
    assert(math.abs(r.getDouble(0) - f) < 1e-9)
  }

  test("partialCorr: a pure confound is explained away by z") {
    // x and y both driven by z, no direct link
    val data = Array.tabulate(500) { _ =>
      val z = rnd.nextGaussian()
      (z + rnd.nextGaussian() * 0.3, z + rnd.nextGaussian() * 0.3, z, "g")
    }.toSeq.toDF("x", "y", "z", "g")
    val r = one(AssocOps.partialCorr(data, col("x"), col("y"), col("z"),
      Seq("g")).select("r_xy", "r_xy_z", "pvalue"))
    assert(r.getDouble(0) > 0.7, s"raw corr ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1)) < 0.15,
      s"partial ${r.getDouble(1)} should vanish")
    assert(r.getDouble(2) > 0.001)
  }

  test("miBinned: independence gives mi ~ 0; y = x gives nmi = 1") {
    val ind = Array.fill(4000)((rnd.nextDouble(), rnd.nextDouble(), "g"))
      .toSeq.toDF("x", "y", "g")
    val ri = one(AssocOps.miBinned(ind, col("x"), col("y"), Seq("g"), 8)
      .select("mi", "nmi"))
    assert(ri.getDouble(0) < 0.03, s"independent mi ${ri.getDouble(0)}")
    val same = Array.fill(4000) { val v = rnd.nextDouble(); (v, v, "g") }
      .toSeq.toDF("x", "y", "g")
    val rs = one(AssocOps.miBinned(same, col("x"), col("y"), Seq("g"), 8)
      .select("nmi"))
    assert(math.abs(rs.getDouble(0) - 1.0) < 1e-9,
      s"identical nmi ${rs.getDouble(0)}")
  }

  test("miBinned matches the local histogram loop") {
    val data = Array.fill(900)(
      (rnd.nextDouble() * 7, rnd.nextDouble() * 3))
    val df = data.toSeq.map { case (x, y) => (x, y, "g") }
      .toDF("x", "y", "g")
    val r = one(AssocOps.miBinned(df, col("x"), col("y"), Seq("g"), 6)
      .select("mi", "nmi"))
    val xlo = data.map(_._1).min; val xhi = data.map(_._1).max
    val ylo = data.map(_._2).min; val yhi = data.map(_._2).max
    def b(v: Double, lo: Double, hi: Double) =
      math.min(math.floor((v - lo) / (hi - lo) * 6).toInt, 5)
    val joint = Array.ofDim[Double](6, 6)
    data.foreach { case (x, y) =>
      joint(b(x, xlo, xhi))(b(y, ylo, yhi)) += 1.0 / data.length }
    val px = (0 until 6).map(i => joint(i).sum)
    val py = (0 until 6).map(j => (0 until 6).map(i => joint(i)(j)).sum)
    var mi = 0.0; var hx = 0.0; var hy = 0.0
    for (i <- 0 until 6; j <- 0 until 6; if joint(i)(j) > 0) {
      mi += joint(i)(j) * math.log(joint(i)(j) / (px(i) * py(j)))
      hx -= joint(i)(j) * math.log(px(i))
      hy -= joint(i)(j) * math.log(py(j))
    }
    assert(math.abs(r.getDouble(0) - mi) < 1e-9)
    assert(math.abs(r.getDouble(1) - mi / math.sqrt(hx * hy)) < 1e-9)
  }

  test("quantileReg: local replay parity + the quantile property") {
    val data = Array.tabulate(800) { _ =>
      val x = rnd.nextDouble() * 10
      (3.0 + 2.0 * x + rnd.nextGaussian() * (1.0 + 0.3 * x), x, "g")
    }
    val df = data.toSeq.toDF("y", "x", "g")
    val r = one(RobustOps.quantileReg(df, col("y"), col("x"), 0.75,
      Seq("g"), maxIter = 32)
      .select("slope", "intercept", "below_frac"))
    // local replay of the same contract (centered, like the op)
    val n = data.length
    val myBar = data.map(_._1).sum / n
    val mxBar = data.map(_._2).sum / n
    val ys = data.map(_._1 - myBar); val xs = data.map(_._2 - mxBar)
    def fit(w: Array[Double]) = {
      val sw = w.sum
      val swx = w.zip(xs).map(p => p._1 * p._2).sum
      val swy = w.zip(ys).map(p => p._1 * p._2).sum
      val swxx = w.zip(xs).map(p => p._1 * p._2 * p._2).sum
      val swxy = w.indices.map(i => w(i) * xs(i) * ys(i)).sum
      val b = (swxy - swx * swy / sw) / (swxx - swx * swx / sw)
      (swy / sw - b * swx / sw, b)
    }
    var (a, bb) = fit(Array.fill(n)(1.0))
    for (_ <- 1 to 32) {
      val w = Array.tabulate(n) { i =>
        val e = ys(i) - a - bb * xs(i)
        val ramp = math.min(math.max((e + 1e-6) / 2e-6, 0.0), 1.0)
        (0.25 + 0.5 * ramp) / math.max(math.abs(e), 1e-6)
      }
      val ab = fit(w); a = ab._1; bb = ab._2
    }
    assert(math.abs(r.getDouble(0) - bb) < 1e-9)
    assert(math.abs(r.getDouble(1) - (a + myBar - bb * mxBar)) < 1e-9)
    // linear convergence: 32 iterations lands near the 0.75 line
    assert(math.abs(r.getDouble(2) - 0.75) < 0.05,
      s"below_frac ${r.getDouble(2)}")
    // heteroscedastic slope: the 0.75 line is steeper than the median
    val med = one(RobustOps.quantileReg(df, col("y"), col("x"), 0.5,
      Seq("g"), maxIter = 32).select("slope")).getDouble(0)
    assert(r.getDouble(0) > med, s"q75 ${r.getDouble(0)} vs med $med")
  }
}
