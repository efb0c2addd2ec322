package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RobustOps

/** Robust regression: the distributed IRLS must equal a local replay
  * of the exact same fixed-iteration contract, and the M-estimators
  * must shrug off planted outliers that provably drag OLS. */
class RobustSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private val rnd = new scala.util.Random(31)
  // clean line y = 3 + 2x + noise; wild outliers concentrated in the
  // low-x half so they DRAG the OLS slope, not just the intercept
  private val pts = Array.tabulate(300) { i =>
    val x = i / 10.0
    val y =
      if (i % 10 == 9 && i < 150) 500.0 + rnd.nextDouble() * 100
      else 3.0 + 2.0 * x + rnd.nextGaussian() * 0.5
    (x, y)
  }
  private lazy val df = pts.toSeq.map { case (x, y) => (x, y, "g") }
    .toDF("x", "y", "g")

  private def one(d: org.apache.spark.sql.DataFrame) = d.collect()(0)

  /** Local replay of the exact mReg contract. */
  private def local(method: String, c: Double, iters: Int) = {
    val xs = pts.map(_._1); val ys = pts.map(_._2)
    def fit(w: Array[Double]) = {
      val sw = w.sum
      val swx = w.zip(xs).map(p => p._1 * p._2).sum
      val swy = w.zip(ys).map(p => p._1 * p._2).sum
      val swxx = w.zip(xs).map(p => p._1 * p._2 * p._2).sum
      val swxy = w.indices.map(i => w(i) * xs(i) * ys(i)).sum
      val b = (swxy - swx * swy / sw) / (swxx - swx * swx / sw)
      (swy / sw - b * swx / sw, b)
    }
    def med(a: Array[Double]) = {
      val s = a.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    var (a, b) = fit(Array.fill(pts.length)(1.0))
    var s = 0.0
    for (_ <- 1 to iters) {
      val e = pts.map { case (x, y) => y - a - b * x }
      s = med(e.map(math.abs)) / 0.6745
      val w = e.map { ei =>
        if (s <= 0) 1.0
        else {
          val u = ei / (s * c)
          method match {
            case "huber" => math.min(1.0, 1.0 / math.abs(u))
            case _ => if (math.abs(u) < 1) math.pow(1 - u * u, 2) else 0.0
          }
        }
      }
      val ab = fit(w); a = ab._1; b = ab._2
    }
    val e = pts.map { case (x, y) => y - a - b * x }
    (a, b, med(e.map(math.abs)) / 0.6745)
  }

  test("huberReg matches the local fixed-iteration replay") {
    val r = one(RobustOps.huberReg(df, col("y"), col("x"), Seq("g"),
      maxIter = 3).select("slope", "intercept", "scale"))
    val (a, b, s) = local("huber", 1.345, 3)
    assert(math.abs(r.getDouble(0) - b) < 1e-9, s"b ${r.getDouble(0)} vs $b")
    assert(math.abs(r.getDouble(1) - a) < 1e-9)
    assert(math.abs(r.getDouble(2) - s) < 1e-9)
  }

  test("bisquareReg matches the local fixed-iteration replay") {
    val r = one(RobustOps.bisquareReg(df, col("y"), col("x"), Seq("g"),
      maxIter = 3).select("slope", "intercept"))
    val (a, b, _) = local("bisquare", 4.685, 3)
    assert(math.abs(r.getDouble(0) - b) < 1e-9)
    assert(math.abs(r.getDouble(1) - a) < 1e-9)
  }

  test("M-estimators resist the outlier band that drags OLS") {
    val ols = one(df.groupBy("g").agg(graft.ops.LinRegOps
      .simpleSlope(col("x"), col("y")).as("slope"))
      .select("slope")).getDouble(0)
    val hub = one(RobustOps.huberReg(df, col("y"), col("x"), Seq("g"),
      maxIter = 5).select("slope")).getDouble(0)
    val bis = one(RobustOps.bisquareReg(df, col("y"), col("x"), Seq("g"),
      maxIter = 5).select("slope")).getDouble(0)
    // OLS is pulled far from the true slope 2; the M-fits stay close
    assert(math.abs(ols - 2.0) > 1.0, s"OLS should be dragged, got $ols")
    assert(math.abs(hub - 2.0) < 0.5, s"huber drifted: $hub")
    assert(math.abs(bis - 2.0) < 0.2, s"bisquare drifted: $bis")
  }

  test("distributed path (above graft.maxLocalIrls) matches the local " +
      "fast path within float-summation noise") {
    val loc = one(RobustOps.huberReg(df, col("y"), col("x"), Seq("g"),
      maxIter = 2).select("slope", "intercept", "scale"))
    System.setProperty("graft.maxLocalIrls", "1")
    try {
      val dist = one(RobustOps.huberReg(df, col("y"), col("x"), Seq("g"),
        maxIter = 2).select("slope", "intercept", "scale"))
      for (i <- 0 to 2)
        assert(math.abs(loc.getDouble(i) - dist.getDouble(i)) <
          1e-8 * (1 + math.abs(loc.getDouble(i))),
          s"col $i: ${loc.getDouble(i)} vs ${dist.getDouble(i)}")
    } finally System.clearProperty("graft.maxLocalIrls")
  }

  test("ungrouped path agrees with the single-group path") {
    val rg = one(RobustOps.huberReg(df, col("y"), col("x"), Seq("g"),
      maxIter = 2).select("slope"))
    val ru = one(RobustOps.huberReg(df, col("y"), col("x"), Nil,
      maxIter = 2).select("slope"))
    assert(math.abs(rg.getDouble(0) - ru.getDouble(0)) < 1e-12)
  }
}
