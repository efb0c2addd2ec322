package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DriftOps

/** Drift-distance family: distributed statistics must equal local
  * loop implementations on randomized samples, plus analytic anchors
  * (W1 between shifted point masses = the shift; JS between identical
  * samples = 0; MMD^2 sign behavior under H0/H1). */
class DriftSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val xs = Array.fill(150)(rnd.nextDouble() * 10.0)
  private val ys = Array.fill(120)(rnd.nextDouble() * 10.0 + 2.0)
  private lazy val two = (xs.map((_, 1)) ++ ys.map((_, 0))).toSeq
    .toDF("x", "s")

  private def one(d: org.apache.spark.sql.DataFrame) = d.collect()(0)

  /** Local ECDF-integral distances over pooled distinct values. */
  private def localEcdf(a: Array[Double], b: Array[Double]) = {
    val vals = (a ++ b).distinct.sorted
    var w1 = 0.0; var cr = 0.0
    for (i <- 0 until vals.length - 1) {
      val f1 = a.count(_ <= vals(i)).toDouble / a.length
      val f2 = b.count(_ <= vals(i)).toDouble / b.length
      val dx = vals(i + 1) - vals(i)
      w1 += math.abs(f1 - f2) * dx
      cr += (f1 - f2) * (f1 - f2) * dx
    }
    (w1, cr, math.sqrt(2 * cr))
  }

  test("ecdfDistances matches the local ECDF integral (ungrouped)") {
    val r = one(DriftOps.ecdfDistances(two, col("x"), col("s") === 1, Nil)
      .select("wasserstein", "cramer", "energy", "n1", "n2"))
    val (w1, cr, en) = localEcdf(xs, ys)
    assert(r.getLong(3) == xs.length && r.getLong(4) == ys.length)
    assert(math.abs(r.getDouble(0) - w1) < 1e-9, s"w1 ${r.getDouble(0)} vs $w1")
    assert(math.abs(r.getDouble(1) - cr) < 1e-9)
    assert(math.abs(r.getDouble(2) - en) < 1e-9)
  }

  test("ecdfDistances grouped path agrees with the ungrouped path") {
    val g = two.withColumn("g", lit("a"))
    val rg = one(DriftOps.ecdfDistances(g, col("x"), col("s") === 1,
      Seq("g")).select("wasserstein", "energy"))
    val ru = one(DriftOps.ecdfDistances(two, col("x"), col("s") === 1,
      Nil).select("wasserstein", "energy"))
    assert(math.abs(rg.getDouble(0) - ru.getDouble(0)) < 1e-12)
    assert(math.abs(rg.getDouble(1) - ru.getDouble(1)) < 1e-12)
  }

  test("W1 between two point masses is their distance") {
    val d = (Seq.fill(40)((3.0, 1)) ++ Seq.fill(25)((7.5, 0)))
      .toDF("x", "s")
    val r = one(DriftOps.ecdfDistances(d, col("x"), col("s") === 1, Nil)
      .select("wasserstein"))
    assert(math.abs(r.getDouble(0) - 4.5) < 1e-12)
  }

  test("histDivergences: identical samples give zero everything") {
    val d = (xs.map((_, 1)) ++ xs.map((_, 0))).toSeq.toDF("x", "s")
    val r = one(DriftOps.histDivergences(d, col("x"), col("s") === 1,
      Nil, 16).select("js_div", "kl_pq", "kl_qp", "tv_dist"))
    for (i <- 0 to 3) assert(math.abs(r.getDouble(i)) < 1e-12)
  }

  test("histDivergences matches a local histogram loop") {
    val r = one(DriftOps.histDivergences(two, col("x"), col("s") === 1,
      Nil, 10).select("js_div", "kl_pq", "kl_qp", "tv_dist"))
    val all = xs ++ ys
    val lo = all.min; val hi = all.max
    def binOf(v: Double) =
      math.min(math.floor((v - lo) / (hi - lo) * 10).toInt, 9)
    val p = Array.fill(10)(0.0); val q = Array.fill(10)(0.0)
    xs.foreach(v => p(binOf(v)) += 1.0 / xs.length)
    ys.foreach(v => q(binOf(v)) += 1.0 / ys.length)
    def term(a: Double, b: Double) =
      if (a > 0) a * math.log(a / b) else 0.0
    val js = (0 until 10).map(i => term(p(i), (p(i) + q(i)) / 2) +
      term(q(i), (p(i) + q(i)) / 2)).sum / 2
    val klpq = (0 until 10)
      .map(i => if (p(i) > 0 && q(i) > 0) p(i) * math.log(p(i) / q(i))
        else 0.0).sum
    val klqp = (0 until 10)
      .map(i => if (p(i) > 0 && q(i) > 0) q(i) * math.log(q(i) / p(i))
        else 0.0).sum
    val tv = (0 until 10).map(i => math.abs(p(i) - q(i))).sum / 2
    assert(math.abs(r.getDouble(0) - js) < 1e-9)
    assert(math.abs(r.getDouble(1) - klpq) < 1e-9)
    assert(math.abs(r.getDouble(2) - klqp) < 1e-9)
    assert(math.abs(r.getDouble(3) - tv) < 1e-9)
  }

  test("ad2Samp matches the local ECDF loop and outweighs CvM in tails") {
    val r = one(graft.ops.DiagOps.ad2Samp(two, col("x"), col("s") === 1,
      Nil).select("statistic", "n1", "n2"))
    val vals = (xs ++ ys).distinct.sorted
    val n1 = xs.length.toDouble; val n2 = ys.length.toDouble
    val nn = n1 + n2
    var a2 = 0.0
    for (v <- vals) {
      val f1 = xs.count(_ <= v) / n1
      val f2 = ys.count(_ <= v) / n2
      val h = (xs.count(_ <= v) + ys.count(_ <= v)) / nn
      val cnt = xs.count(_ == v) + ys.count(_ == v)
      if (h < 1.0) a2 += cnt * (f1 - f2) * (f1 - f2) / (h * (1 - h))
    }
    a2 *= n1 * n2 / (nn * nn)
    assert(r.getLong(1) == xs.length && r.getLong(2) == ys.length)
    assert(math.abs(r.getDouble(0) - a2) < 1e-9,
      s"${r.getDouble(0)} vs $a2")
  }

  test("mmdLinear matches the local pair loop and separates H0/H1") {
    val d = 8
    def vec(shift: Double) =
      Array.fill(d)(rnd.nextGaussian() + shift).toSeq
    // H1: shifted distributions, enough rows for a stable sign
    val rows = (0 until 300).map(i => (i.toLong, vec(0.0), true)) ++
      (300 until 600).map(i => (i.toLong, vec(1.5), false))
    val df = rows.toDF("id", "v", "in1")
    val gamma = 1.0 / d
    val r = one(DriftOps.mmdLinear(df, col("v"), col("id"), col("in1"),
      gamma).select("m_pairs", "mmd2"))
    // local replay: rank by id within each sample, pair consecutive
    def k(a: Seq[Double], b: Seq[Double]) = math.exp(-gamma *
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val xsv = rows.filter(_._3).sortBy(_._1).map(_._2)
    val ysv = rows.filterNot(_._3).sortBy(_._1).map(_._2)
    val m = math.min(xsv.length / 2, ysv.length / 2)
    val hs = (0 until m).map { i =>
      val (x1, x2) = (xsv(2 * i), xsv(2 * i + 1))
      val (y1, y2) = (ysv(2 * i), ysv(2 * i + 1))
      k(x1, x2) + k(y1, y2) - k(x1, y2) - k(x2, y1)
    }
    assert(r.getLong(0) == m)
    assert(math.abs(r.getDouble(1) - hs.sum / m) < 1e-9)
    assert(r.getDouble(1) > 0.05, "H1 shift must give positive MMD^2")
  }
}
