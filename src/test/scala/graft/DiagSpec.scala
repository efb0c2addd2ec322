package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DiagOps

/** Diagnostics family: every distributed statistic must equal a
  * straightforward local (loop-based) implementation on randomized
  * series, plus published known-value anchors where they exist
  * (tea-tasting Fisher table, alpha=1 for duplicated items). */
class DiagSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val xs = Array.fill(200)(rnd.nextDouble() * 100.0)
  private lazy val df = xs.toSeq.zipWithIndex
    .map { case (v, i) => (i.toLong, v, "g") }
    .toDF("t", "x", "g")

  private def one(d: org.apache.spark.sql.DataFrame) = d.collect()(0)

  test("ljungBox matches the local autocorrelation loop") {
    val r = one(DiagOps.ljungBox(df, col("x"), col("t"), Seq("g"), 5)
      .select("statistic", "bp_statistic", "n"))
    val n = xs.length
    val m = xs.sum / n
    val s0 = xs.map(v => (v - m) * (v - m)).sum
    val rho = (1 to 5).map { k =>
      (k until n).map(t => (xs(t) - m) * (xs(t - k) - m)).sum / s0
    }
    val qLb = n * (n + 2.0) *
      rho.zipWithIndex.map { case (p, i) => p * p / (n - (i + 1)) }.sum
    val qBp = n * rho.map(p => p * p).sum
    assert(r.getLong(2) == n)
    assert(math.abs(r.getDouble(0) - qLb) < 1e-8, s"lb ${r.getDouble(0)} vs $qLb")
    assert(math.abs(r.getDouble(1) - qBp) < 1e-8)
  }

  test("hjorth matches the local difference-variance loop") {
    val r = one(DiagOps.hjorth(df, col("x"), col("t"), Seq("g"))
      .select("activity", "mobility", "complexity"))
    def varPop(a: Array[Double]) = {
      val mu = a.sum / a.length
      a.map(v => (v - mu) * (v - mu)).sum / a.length
    }
    val d1 = xs.sliding(2).map(p => p(1) - p(0)).toArray
    val d2 = d1.sliding(2).map(p => p(1) - p(0)).toArray
    val act = varPop(xs)
    val mob = math.sqrt(varPop(d1) / act)
    val cpx = math.sqrt(varPop(d2) / varPop(d1)) / mob
    assert(math.abs(r.getDouble(0) - act) < 1e-8)
    assert(math.abs(r.getDouble(1) - mob) < 1e-10)
    assert(math.abs(r.getDouble(2) - cpx) < 1e-10)
  }

  test("runsTest counts runs around the median correctly") {
    // hand-checkable: signs vs median 2.0 are + + - (drop) - + - => 4 runs, n1=3, n2=3
    val vals = Seq(9.0, 8.0, 1.0, 2.0, 1.5, 7.0, 0.5)
    // median = 2.0 -> signs of (x != med): + + - <drop> - + -
    val d = vals.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
      .toDF("t", "x", "g")
    val r = one(DiagOps.runsTest(d, col("x"), col("t"), Seq("g"))
      .select("n1", "n2", "runs"))
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 && r.getLong(2) == 4)
  }

  test("runsTest z-statistic matches the closed form") {
    val r = one(DiagOps.runsTest(df, col("x"), col("t"), Seq("g"))
      .select("n1", "n2", "runs", "statistic", "pvalue"))
    val (n1, n2, runs) = (r.getLong(0).toDouble, r.getLong(1).toDouble,
      r.getLong(2).toDouble)
    val n = n1 + n2
    val mu = 1 + 2 * n1 * n2 / n
    val sig = math.sqrt(2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1)))
    assert(math.abs(r.getDouble(3) - (runs - mu) / sig) < 1e-10)
    assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
  }

  test("moodMedian matches a local chi2 over the 2xk median table") {
    val d = (xs.take(100).map(v => (v, "a")) ++
      xs.drop(100).map(v => (v + 10.0, "b"))).toSeq
      .toDF("x", "grp")
    val r = one(DiagOps.moodMedian(d, col("x"), Seq("grp"))
      .select("statistic", "df", "grand_median"))
    val all = (xs.take(100) ++ xs.drop(100).map(_ + 10.0)).sorted
    val gm = (all(99) + all(100)) / 2.0
    val a1 = xs.take(100).count(_ > gm).toDouble
    val b1 = 100 - a1
    val a2 = xs.drop(100).map(_ + 10.0).count(_ > gm).toDouble
    val b2 = 100 - a2
    val (ta, tb, nn) = (a1 + a2, b1 + b2, 200.0)
    def cell(o: Double, rt: Double, ct: Double) = {
      val e = rt * ct / nn; (o - e) * (o - e) / e
    }
    val stat = cell(a1, 100, ta) + cell(b1, 100, tb) +
      cell(a2, 100, ta) + cell(b2, 100, tb)
    assert(math.abs(r.getDouble(0) - stat) < 1e-8)
    assert(r.getDouble(1) == 1.0)
    assert(math.abs(r.getDouble(2) - gm) < 1e-12)
  }

  test("cvm2Samp matches the local ECDF integral") {
    val s1 = xs.take(80)
    val s2 = xs.drop(80).map(_ * 1.1)
    val d = (s1.map(v => (v, 1)) ++ s2.map(v => (v, 0))).toSeq
      .toDF("x", "s").withColumn("g", lit(1))
    val r = one(DiagOps.cvm2Samp(d, col("x"), col("s") === 1, Seq("g"))
      .select("n1", "n2", "statistic"))
    val pooled = (s1 ++ s2).sorted
    def ecdf(a: Array[Double], v: Double) =
      a.count(_ <= v).toDouble / a.length
    val t = pooled.map(v => math.pow(ecdf(s1, v) - ecdf(s2, v), 2)).sum
    val stat = s1.length.toDouble * s2.length /
      math.pow(s1.length + s2.length, 2) * t
    assert(r.getLong(0) == 80 && r.getLong(1) == 120)
    assert(math.abs(r.getDouble(2) - stat) < 1e-10)
  }

  test("breuschPagan flags constructed heteroscedasticity, not " +
      "homoscedastic noise, and matches the local LM formula") {
    val het = (0 until 400).map { i =>
      val x = i / 40.0
      (x, 2.0 + 3.0 * x + rnd.nextGaussian() * (0.2 + x), "g")
    }.toDF("x", "y", "g")
    val r = one(DiagOps.breuschPagan(het, col("y"), col("x"), Seq("g"))
      .select("statistic", "pvalue", "n"))
    assert(r.getDouble(1) < 0.01, s"het pvalue ${r.getDouble(1)}")
    // local check
    val rows = het.select("x", "y").collect()
      .map(q => (q.getDouble(0), q.getDouble(1)))
    val n = rows.length
    val mx = rows.map(_._1).sum / n; val my = rows.map(_._2).sum / n
    val b1 = rows.map(q => (q._1 - mx) * (q._2 - my)).sum /
      rows.map(q => (q._1 - mx) * (q._1 - mx)).sum
    val e2 = rows.map(q => math.pow(q._2 - my - b1 * (q._1 - mx), 2))
    val me = e2.sum / n
    val cov = rows.zip(e2).map { case ((x, _), e) => (x - mx) * (e - me) }
      .sum / (n - 1)
    val sx = math.sqrt(rows.map(q => math.pow(q._1 - mx, 2)).sum / (n - 1))
    val se = math.sqrt(e2.map(v => math.pow(v - me, 2)).sum / (n - 1))
    val lm = n * math.pow(cov / (sx * se), 2)
    assert(math.abs(r.getDouble(0) - lm) < 1e-6 * lm)
    val hom = (0 until 400).map { i =>
      val x = i / 40.0
      (x, 2.0 + 3.0 * x + rnd.nextGaussian(), "g")
    }.toDF("x", "y", "g")
    val r2 = one(DiagOps.breuschPagan(hom, col("y"), col("x"), Seq("g"))
      .select("pvalue"))
    assert(r2.getDouble(0) > 0.01, s"hom pvalue ${r2.getDouble(0)}")
  }

  test("fisherExact reproduces the tea-tasting table") {
    // [[3,1],[1,3]]: two-sided p = 0.485714285714..., sample OR = 9
    val rows = Seq.fill(3)((1, 1)) ++ Seq.fill(1)((1, 0)) ++
      Seq.fill(1)((0, 1)) ++ Seq.fill(3)((0, 0))
    val d = rows.toDF("r", "c")
    val res = one(DiagOps.fisherExact(d, col("r") === 1, col("c") === 1))
    assert(res.getLong(0) == 3 && res.getLong(1) == 1 &&
      res.getLong(2) == 1 && res.getLong(3) == 3)
    assert(math.abs(res.getDouble(4) - 9.0) < 1e-12)
    assert(math.abs(res.getDouble(5) - 0.4857142857142857) < 1e-12)
  }

  test("fisherExact two-sided p sums to 1 over a symmetric table") {
    // balanced margins: p must never exceed 1 and equals 1 when the
    // observed table is the mode of the hypergeometric
    val rows = Seq.fill(5)((1, 1)) ++ Seq.fill(5)((1, 0)) ++
      Seq.fill(5)((0, 1)) ++ Seq.fill(5)((0, 0))
    val res = one(DiagOps.fisherExact(rows.toDF("r", "c"),
      col("r") === 1, col("c") === 1))
    assert(math.abs(res.getDouble(5) - 1.0) < 1e-12)
  }

  test("hurst separates a random walk from white noise") {
    val g = new scala.util.Random(11)
    val noise = Array.fill(4096)(g.nextGaussian())
    val walk = noise.scanLeft(0.0)(_ + _).drop(1)
    def hu(a: Array[Double]): Double = {
      val d = a.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
        .toDF("t", "x", "g")
      one(DiagOps.hurst(d, col("x"), col("t"), Seq("g"))
        .select("hurst")).getDouble(0)
    }
    val hn = hu(noise); val hw = hu(walk)
    assert(hn > 0.35 && hn < 0.68, s"white-noise hurst $hn")
    assert(hw > 0.85 && hw < 1.15, s"random-walk hurst $hw")
    assert(hw > hn + 0.2)
  }

  test("cronbachAlpha is 1 for duplicated items and matches the " +
      "closed form") {
    val d = xs.toSeq.map(v => (v, v, v)).toDF("i1", "i2", "i3")
    val r = one(DiagOps.cronbachAlpha(d,
      Seq(col("i1"), col("i2"), col("i3"))).select("k", "alpha"))
    assert(r.getInt(0) == 3)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    // mixed items: closed form k/(k-1) (1 - sum var_i / var_tot)
    val i2 = xs.map(v => v * 0.5 + 3.0)
    val i3 = xs.indices.map(i => xs(i) + (if (i % 2 == 0) 5.0 else -5.0))
    val dd = xs.indices.map(i => (xs(i), i2(i), i3(i)))
      .toDF("i1", "i2", "i3")
    val r2 = one(DiagOps.cronbachAlpha(dd,
      Seq(col("i1"), col("i2"), col("i3"))).select("alpha"))
    def varS(a: Seq[Double]) = {
      val mu = a.sum / a.length
      a.map(v => (v - mu) * (v - mu)).sum / (a.length - 1)
    }
    val tot = xs.indices.map(i => xs(i) + i2(i) + i3(i))
    val exp = 1.5 * (1 - (varS(xs.toSeq) + varS(i2.toSeq) + varS(i3)) /
      varS(tot))
    assert(math.abs(r2.getDouble(0) - exp) < 1e-10)
  }
}
